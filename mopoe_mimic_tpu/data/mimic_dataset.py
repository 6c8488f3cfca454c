"""Real MIMIC-CXR dataset over the preprocessed array store.

Parity: Mimic (mimic/dataio/MimicDataset.py:23-205) —
  * loads per-split PA / Lateral image arrays, findings CSV, labels CSV
    from ``dir_data/files_small_{img_size}``;
  * filters rows whose labels contain -1 ('uncertain',
    dataio/utils.py:158-171), optional undersampling to balance
    no-label/has-label counts;
  * char mode: one-hot encodes the (lowercased) findings on the fly;
    word mode: id-encodes via the persisted vocabulary.

Storage: ``.npy`` memmaps written by tensor_builder.py (torch ``.pt``
files from the reference pipeline are read too, converted on first
touch). Columns are exposed whole (`arrays`) for the fast batched loader;
text is encoded lazily per batch to keep memory bounded in char mode.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.text_codec import one_hot_encode
from mopoe_mimic_tpu.data.vocab import Vocab
from mopoe_mimic_tpu.utils.logger import log

LABELS = ["Lung Opacity", "Pleural Effusion", "Support Devices"]
BINARY = ["Finding"]


def filter_labels(labels: pd.DataFrame, which: List[str], undersample: bool, split: str) -> pd.DataFrame:
    """Drop rows containing -1 ('uncertain'); optionally undersample the
    no-label class to the has-label count (dataio/utils.py:158-171)."""
    keep = ~(labels[which] == -1).any(axis=1)
    labels = labels[keep]
    if undersample and split == "train":
        has = labels[(labels[which] == 1).any(axis=1)]
        hasnot = labels[~(labels[which] == 1).any(axis=1)]
        n = min(len(has), len(hasnot))
        labels = pd.concat([has.iloc[:n], hasnot.iloc[:n]]).sort_index()
    return labels


def _load_images(path_base: Path, split: str, view: str) -> np.ndarray:
    """Load {split}_{view} images from .npy (preferred) or legacy .pt."""
    npy = path_base / f"{split}_{view}.npy"
    if npy.exists():
        return np.load(npy, mmap_mode="r")
    pt = path_base / f"{split}_{view}.pt"
    if pt.exists():
        import torch

        arr = torch.load(pt, map_location="cpu").numpy()
        np.save(npy, arr)
        log.info(f"converted {pt} → {npy}")
        return np.load(npy, mmap_mode="r")
    raise FileNotFoundError(f"no image store for {split}/{view} under {path_base}")


class MimicDataset:
    def __init__(self, cfg: MopoeConfig, split: str):
        self.cfg = cfg
        self.split = split
        self.str_labels = BINARY if cfg.binary_labels else LABELS
        # use_toy_dataset selects the 100-row slice written by
        # tensor_builder.create_toy_set (reference: create_toy_set.py +
        # the toy dir selection in dataio)
        prefix = "toy_files_small" if cfg.use_toy_dataset else "files_small"
        base = Path(cfg.dir_data).expanduser() / f"{prefix}_{cfg.img_size}"
        # text-only mode (VAETextMimic twin / reference MimicText,
        # MimicDataset.py:131-205): don't touch the image stores at all
        self.imgs_pa = self.imgs_lat = None
        if not cfg.only_text_modality:
            self.imgs_pa = _load_images(base, split, "pa")
            self.imgs_lat = _load_images(base, split, "lat")
        self.report_findings = pd.read_csv(base / f"{split}_findings.csv")["findings"]
        labels_df = pd.read_csv(base / f"{split}_labels.csv")[self.str_labels].fillna(0)
        labels_df = filter_labels(
            labels_df, self.str_labels, cfg.undersample_dataset, split
        )
        self.row_index = labels_df.index.to_numpy()
        self.labels = labels_df.to_numpy().astype(np.float32)

        self.vocab: Vocab | None = None
        if cfg.text_encoding == "word":
            self.vocab = Vocab.load(str(base), cfg.word_min_occ, cfg.len_sequence)
            if self.vocab is None:
                if split != "train":
                    raise FileNotFoundError(
                        "vocab missing; build it from the train split first"
                    )
                self.vocab = Vocab.build(self.report_findings, cfg.word_min_occ)
                self.vocab.save(str(base), cfg.word_min_occ, cfg.len_sequence)
            self.i2w = self.vocab.i2w
            self._text_ids = np.stack(
                [
                    self.vocab.encode(str(self.report_findings.iloc[i]), cfg.len_sequence)
                    for i in range(len(self.report_findings))
                ]
            )

    def __len__(self) -> int:
        return len(self.labels)

    def text_ids(self, idx: np.ndarray) -> np.ndarray:
        """Compact id encoding for the given dataset rows: int32 word ids
        or uint8 char alphabet ids (DeviceStore's HBM-resident form)."""
        idx = np.atleast_1d(np.asarray(idx))
        if self.cfg.text_encoding == "word":
            return np.stack([
                self._text_ids[int(self.row_index[i])] for i in idx
            ]).astype(np.int32)
        from mopoe_mimic_tpu.data.text_codec import char_ids_encode

        return np.stack([
            char_ids_encode(
                self.cfg.len_sequence,
                str(self.report_findings.iloc[int(self.row_index[i])]).lower(),
            )
            for i in idx
        ])

    def _encode_text(self, ds_index: int) -> np.ndarray:
        if self.cfg.text_encoding == "word":
            return self._text_ids[ds_index]
        return one_hot_encode(
            self.cfg.len_sequence, str(self.report_findings.iloc[ds_index]).lower()
        )

    def _img(self, store: np.ndarray, ds_index: int) -> np.ndarray:
        """One image, HWC, float32 in [0,1] — ALWAYS. uint8 stores
        (tensor_builder store_uint8) dequantize here so every loader
        consumer (clf trainer, representation/likelihood evals, plots)
        sees one contract. The compact transfer paths opt in explicitly:
        prefetch_to_device(quantize=cfg.transfer_uint8) re-quantizes for
        the host→device hop, and DeviceStore pulls raw bytes through
        ``image_uint8`` below — both byte-exact round-trips."""
        raw = store[ds_index]
        if raw.dtype == np.uint8:
            img = np.asarray(raw, dtype=np.float32) / 255.0
        else:
            img = np.asarray(raw, dtype=np.float32)
        if img.ndim == 2:
            img = img[..., None]  # HWC
        elif img.shape[0] in (1, 3):  # CHW legacy layout → HWC
            img = np.moveaxis(img, 0, -1)
        return img

    def image_uint8(self, key: str, idx: np.ndarray) -> np.ndarray:
        """Raw uint8 HWC rows for DeviceStore's compact HBM form — no
        float round-trip for uint8 stores; float stores quantize
        (round(x·255), the DeviceStore contract)."""
        store = self.imgs_pa if key == "PA" else self.imgs_lat
        idx = np.atleast_1d(np.asarray(idx))
        rows = np.stack([np.asarray(store[int(self.row_index[i])]) for i in idx])
        if rows.ndim == 3:
            rows = rows[..., None]
        elif rows.shape[1] in (1, 3) and rows.shape[-1] not in (1, 3):
            rows = np.moveaxis(rows, 1, -1)
        if rows.dtype == np.uint8:
            return rows
        return np.round(np.clip(rows, 0.0, 1.0) * 255.0).astype(np.uint8)

    def __getitem__(self, idx: int) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
        ds_index = int(self.row_index[idx])
        sample = {"text": self._encode_text(ds_index)}
        if self.imgs_pa is not None:
            sample["PA"] = self._img(self.imgs_pa, ds_index)
            sample["Lateral"] = self._img(self.imgs_lat, ds_index)
        return sample, self.labels[idx]

    @property
    def arrays(self) -> Dict[str, "_Column"]:
        """Column views compatible with BatchLoader's fancy indexing."""
        return {m: _Column(self, m) for m in self.cfg.modality_names}


class _Column:
    """Lazy fancy-indexable column over the dataset (keeps char one-hot
    encoding per-batch instead of materializing ~n·1024·71 floats)."""

    def __init__(self, ds: MimicDataset, key: str):
        self.ds = ds
        self.key = key

    def __getitem__(self, idx) -> np.ndarray:
        idx = np.atleast_1d(np.asarray(idx))
        if self.key == "text":
            if self.ds.cfg.text_encoding == "char":
                # native batch one-hot (mopoe_mimic_tpu/native); numpy fallback inside
                from mopoe_mimic_tpu.native import one_hot_encode_batch

                texts = [
                    str(self.ds.report_findings.iloc[int(self.ds.row_index[i])])
                    for i in idx
                ]
                return one_hot_encode_batch(texts, self.ds.cfg.len_sequence)
            return np.stack([self.ds._encode_text(int(self.ds.row_index[i])) for i in idx])
        store = self.ds.imgs_pa if self.key == "PA" else self.ds.imgs_lat
        return np.stack([self.ds._img(store, int(self.ds.row_index[i])) for i in idx])
