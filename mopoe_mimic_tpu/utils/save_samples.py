"""Sample persistence (parity: mimic/utils/save_samples.py — write
generated images/text to the fid/generation_evaluation trees consumed by
external tooling; the in-framework FID/PRD path streams in memory and
doesn't need the disk round-trip)."""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterable, List

import numpy as np


def write_samples_img_to_file(images: np.ndarray, fn: str, img_per_row: int = 8) -> None:
    """[N, H, W, C] floats in [0,1] — or uint8 in [0,255] (the compact
    serving wire format) — → one PNG grid."""
    from mopoe_mimic_tpu.utils.plotting import _to_grid

    images = np.asarray(images)
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 255.0
    grid = _to_grid(images, per_row=img_per_row)
    try:
        from PIL import Image

        arr = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        Path(fn).parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(arr).save(fn)
    except ImportError:
        np.save(os.path.splitext(fn)[0] + ".npy", grid)


def write_samples_text_to_file(sentences: List[List[str]], fn: str) -> None:
    Path(fn).parent.mkdir(parents=True, exist_ok=True)
    with open(fn, "w") as f:
        for toks in sentences:
            f.write("".join(toks).rstrip("&") + "\n")


def save_generated_samples(exp, samples: dict, epoch: int, kind: str = "random") -> None:
    """Dump per-modality samples under generation_evaluation/."""
    base = Path(exp.paths["gen_eval"]) / f"{kind}_epoch_{epoch}"
    for m, data in samples.items():
        if m == "text":
            from mopoe_mimic_tpu.data.text_codec import tensor_to_tokens

            toks = tensor_to_tokens(exp.cfg, exp, np.asarray(data), probs=True)
            write_samples_text_to_file(toks, str(base / f"{m}.txt"))
        else:
            write_samples_img_to_file(np.asarray(data), str(base / f"{m}.png"))
