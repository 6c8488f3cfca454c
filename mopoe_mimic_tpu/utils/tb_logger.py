"""TensorBoard sink (parity: mimic/utils/TBLogger.py — scalar groups for
train/test loss, per-modality log-probs, per-subset KLDs, joint divergence,
latent mu/logvar means; step = epoch). Backed by tensorboardX when
available, else a no-op stub (the metrics still land in the CSV sink)."""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from mopoe_mimic_tpu.utils.meters import flatten_metrics

try:
    from tensorboardX import SummaryWriter

    _HAVE_TB = True
except ImportError:  # pragma: no cover
    _HAVE_TB = False


class TBLogger:
    def __init__(self, name: str, logdir: Optional[str]):
        self.name = name
        self.writer = SummaryWriter(logdir) if (_HAVE_TB and logdir) else None

    def write_epoch(self, split: str, epoch: int, metrics: Mapping[str, Any]) -> None:
        """metrics: (possibly nested) pytree of floats from MetricAccumulator."""
        if self.writer is None:
            return
        for key, val in flatten_metrics(metrics).items():
            if np.isfinite(val):
                self.writer.add_scalar(f"{split}/{key}", val, epoch)

    def write_scalar(self, tag: str, value: float, epoch: int) -> None:
        if self.writer is not None:
            self.writer.add_scalar(tag, value, epoch)

    def write_image(self, tag: str, img_hwc: np.ndarray, epoch: int) -> None:
        if self.writer is not None:
            self.writer.add_image(tag, img_hwc, epoch, dataformats="HWC")

    def write_text(self, tag: str, text: str, epoch: int) -> None:
        if self.writer is not None:
            self.writer.add_text(tag, text, epoch)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
