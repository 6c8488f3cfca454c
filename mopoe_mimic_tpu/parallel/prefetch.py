"""Input-pipeline overlap: device prefetch of host batches.

The reference overlaps host work with compute via DataLoader worker
processes (dataio/utils.py:115-141). Here a small lookahead queue
device_puts the next batches (sharded over the mesh) while the current
step executes — transfers ride the async dispatch stream, so the TPU
never waits on PCIe for steady-state steps.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Tuple

from mopoe_mimic_tpu.parallel.mesh import shard_batch


def prefetch_to_device(iterator: Iterable, mesh, size: int = 2) -> Iterator:
    """Yields device-resident (batch, labels) tuples with `size` batches in
    flight. Labels stay on host (they only feed host-side eval)."""
    queue = collections.deque()
    it = iter(iterator)

    def enqueue(n: int) -> None:
        for _ in range(n):
            try:
                batch, labels = next(it)
            except StopIteration:
                return
            queue.append((shard_batch(mesh, batch), labels))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
