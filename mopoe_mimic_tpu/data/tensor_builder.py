"""Offline dataset builder: MIMIC-CXR-JPG tree → per-split array store.

Parity: CreateTensorDataset (mimic/dataio/create_tensor_dataset.py:18-248):
  1. walk the JPEG tree, center-crop each image square and antialias-resize
     to img_size, caching resized JPEGs (zip-aware in the reference; plain
     dirs here);
  2. join the split CSVs on PA / Lateral dicom ids, load the resized
     images into one array per (split, view), drop rows with missing
     files;
  3. write ``{split}_pa.npy``, ``{split}_lat.npy`` + findings / labels
     CSVs, deriving the binary 'Finding' label as any(label == 1)
     (create_tensor_dataset.py:166-172).

Also includes the toy-set slicer (create_toy_set.py:1-31) and dataset
mean/std statistics (find_dataset_stats.py:27-49).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np
import pandas as pd

from mopoe_mimic_tpu.utils.logger import log

SPLITS = ("train", "eval", "test")
CHEXPERT_LABELS = ["Lung Opacity", "Pleural Effusion", "Support Devices"]


def center_crop_resize(img, size: int, uint8: bool = False) -> np.ndarray:
    """PIL image → square center crop → antialias resize → float32 [0,1]
    (or raw uint8 bytes when ``uint8`` — exactly float·255)."""
    from PIL import Image

    w, h = img.size
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
    img = img.resize((size, size), Image.LANCZOS)
    if uint8:
        return np.asarray(img, dtype=np.uint8)
    return np.asarray(img, dtype=np.float32) / 255.0


class TensorDatasetBuilder:
    def __init__(
        self,
        dir_mimic: str,
        dir_out: str,
        img_size: int = 128,
        max_rows: Optional[int] = None,
        store_uint8: bool = True,
    ):
        """store_uint8=True (default) writes raw image bytes — 4× smaller
        on disk / in page cache than float32 at MIMIC scale (~2.1 GB vs
        ~8.5 GB for 65k studies × 2 views at 128px) and lossless w.r.t.
        the float store (float == uint8/255). MimicDataset dequantizes on
        load, or passes uint8 straight to the device when
        cfg.transfer_uint8 (train/step.py dequantizes on-device)."""
        self.dir_mimic = Path(dir_mimic)
        self.dir_out = Path(dir_out) / f"files_small_{img_size}"
        self.img_size = img_size
        self.max_rows = max_rows
        self.store_uint8 = store_uint8

    def __call__(self) -> None:
        self.dir_out.mkdir(parents=True, exist_ok=True)
        for split in SPLITS:
            self.create_split(split)

    # ------------------------------------------------------------------

    def _split_frame(self, split: str) -> pd.DataFrame:
        """Expects {split}.csv with columns: path_pa, path_lat, findings,
        impressions, and the CheXpert label columns (the reference builds
        this join from the MIMIC metadata CSVs)."""
        fn = self.dir_mimic / f"{split}.csv"
        df = pd.read_csv(fn)
        if self.max_rows:
            df = df.iloc[: self.max_rows]
        return df

    def create_split(self, split: str) -> None:
        from PIL import Image

        df = self._split_frame(split)
        pas, lats, keep = [], [], []
        for i, row in df.iterrows():
            try:
                with Image.open(self.dir_mimic / row["path_pa"]) as im:
                    pa = center_crop_resize(im.convert("L"), self.img_size,
                                            uint8=self.store_uint8)
                with Image.open(self.dir_mimic / row["path_lat"]) as im:
                    lat = center_crop_resize(im.convert("L"), self.img_size,
                                             uint8=self.store_uint8)
            except (FileNotFoundError, OSError) as e:
                log.debug(f"dropping row {i}: {e}")
                continue
            pas.append(pa)
            lats.append(lat)
            keep.append(i)
        df = df.loc[keep].reset_index(drop=True)
        np.save(self.dir_out / f"{split}_pa.npy", np.stack(pas))
        np.save(self.dir_out / f"{split}_lat.npy", np.stack(lats))
        df[["findings"]].to_csv(self.dir_out / f"{split}_findings.csv", index=False)
        labels = df[[c for c in CHEXPERT_LABELS if c in df.columns]].fillna(0)
        # binary 'Finding' = any positive label (create_tensor_dataset.py:166-172)
        labels["Finding"] = (labels == 1).any(axis=1).astype(int)
        labels.to_csv(self.dir_out / f"{split}_labels.csv", index=False)
        log.info(f"{split}: {len(df)} studies → {self.dir_out}")


def create_toy_set(dir_data: str, img_size: int, n: int = 100) -> None:
    """First-n-rows toy copy (create_toy_set.py)."""
    src = Path(dir_data) / f"files_small_{img_size}"
    dst = Path(dir_data) / f"toy_files_small_{img_size}"
    dst.mkdir(parents=True, exist_ok=True)
    for split in SPLITS:
        for view in ("pa", "lat"):
            np.save(dst / f"{split}_{view}.npy", np.load(src / f"{split}_{view}.npy", mmap_mode="r")[:n])
        for kind in ("findings", "labels"):
            pd.read_csv(src / f"{split}_{kind}.csv").iloc[:n].to_csv(
                dst / f"{split}_{kind}.csv", index=False
            )


def dataset_stats(dir_data: str, img_size: int, split: str = "train") -> Dict[str, float]:
    """Mean/std over the image store (find_dataset_stats.py:27-49)."""
    base = Path(dir_data) / f"files_small_{img_size}"
    out = {}
    for view in ("pa", "lat"):
        arr = np.load(base / f"{split}_{view}.npy", mmap_mode="r")
        scale = 255.0 if arr.dtype == np.uint8 else 1.0
        out[f"{view}_mean"] = float(np.mean(arr) / scale)
        out[f"{view}_std"] = float(np.std(np.asarray(arr, np.float64) / scale))
    return out
