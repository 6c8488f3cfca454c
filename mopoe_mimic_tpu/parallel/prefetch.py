"""Input-pipeline overlap: device prefetch of host batches.

The reference overlaps host work with compute via DataLoader worker
processes (dataio/utils.py:115-141). Here a small lookahead queue
device_puts the next batches (sharded over the mesh) while the current
step executes — transfers ride the async dispatch stream, so the TPU
never waits on PCIe for steady-state steps.
"""

from __future__ import annotations

import collections
from typing import Dict, Iterable, Iterator, Tuple

import numpy as np

from mopoe_mimic_tpu.parallel.mesh import shard_batch


def quantize_batch_uint8(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Quantize float input modalities to uint8 for transfer
    (cfg.transfer_uint8): images in [0,1] and {0,1} one-hots become
    round(x·255); integer ids pass through. The jitted step dequantizes
    (/255) on device — see train/step.py."""
    out = {}
    for k, v in batch.items():
        if np.issubdtype(v.dtype, np.floating):
            out[k] = np.round(np.clip(v, 0.0, 1.0) * 255.0).astype(np.uint8)
        else:
            out[k] = v
    return out


def prefetch_to_device(
    iterator: Iterable, mesh, size: int = 2, quantize: bool = False
) -> Iterator:
    """Yields device-resident (batch, labels) tuples with `size` batches in
    flight. Labels stay on host (they only feed host-side eval).
    quantize=True sends float modalities as uint8 (4× less volume)."""
    queue = collections.deque()
    it = iter(iterator)

    def enqueue(n: int) -> None:
        for _ in range(n):
            try:
                batch, labels = next(it)
            except StopIteration:
                return
            if quantize:
                batch = quantize_batch_uint8(batch)
            queue.append((shard_batch(mesh, batch), labels))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
