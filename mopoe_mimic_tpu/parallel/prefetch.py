"""Input-pipeline overlap: device prefetch of host batches.

The reference overlaps host work with compute via DataLoader worker
processes (dataio/utils.py:115-141). Here a producer thread assembles the
next host batches (memmap gathers, text encode, optional uint8 quantize)
and device_puts them (sharded over the mesh) while the current step
executes — host batch assembly and PCIe transfer both hide behind device
compute, so the TPU never waits on the input pipeline in steady state.
"""

from __future__ import annotations

import collections
import queue as queue_mod
import threading
from typing import Dict, Iterable, Iterator

import numpy as np

from mopoe_mimic_tpu.parallel.mesh import shard_batch

_SENTINEL = object()


def quantize_batch_uint8(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Quantize float input modalities to uint8 for transfer
    (cfg.transfer_uint8): images in [0,1] and {0,1} one-hots become
    round(x·255); integer ids (and already-uint8 stores) pass through.
    The jitted step dequantizes (/255) on device — see train/step.py."""
    out = {}
    for k, v in batch.items():
        if np.issubdtype(v.dtype, np.floating):
            out[k] = np.round(np.clip(v, 0.0, 1.0) * 255.0).astype(np.uint8)
        else:
            out[k] = v
    return out


def prefetch_to_device(
    iterator: Iterable,
    mesh,
    size: int = 2,
    quantize: bool = False,
    threaded: bool = True,
) -> Iterator:
    """Yields device-resident (batch, labels) tuples with up to `size`
    batches in flight. Labels stay on host (they only feed host-side eval).
    quantize=True sends float modalities as uint8 (4× less volume).

    threaded=True (default) runs batch assembly + device_put on a producer
    thread so host work overlaps device compute; threaded=False keeps the
    single-threaded lookahead deque (deterministic call order, useful for
    debugging and profiling the host path in isolation).
    """
    if threaded:
        yield from _prefetch_threaded(iterator, mesh, size, quantize)
        return

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


def _prefetch_threaded(
    iterator: Iterable, mesh, size: int, quantize: bool
) -> Iterator:
    q: queue_mod.Queue = queue_mod.Queue(maxsize=max(size, 1))
    stop = threading.Event()

    def _put(item) -> bool:
        """Blocking put that aborts when the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def _produce() -> None:
        try:
            for batch, labels in iterator:
                if quantize:
                    batch = quantize_batch_uint8(batch)
                if not _put((shard_batch(mesh, batch), labels)):
                    return
        except BaseException as exc:  # forwarded to the consumer
            _put(exc)
            return
        _put(_SENTINEL)

    thread = threading.Thread(target=_produce, daemon=True, name="prefetch")
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # let an in-flight device_put finish before the interpreter (or the
        # caller's runtime state) tears down under the producer's feet; the
        # bounded join cannot deadlock on a wedged transfer
        thread.join(timeout=5.0)
