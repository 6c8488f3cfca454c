"""Profiling subsystem (new capability; SURVEY.md §5 notes the reference
has nothing beyond wall-clock timers at main_mimic.py:59,76).

Wraps jax.profiler: xplane traces for TensorBoard's profile plugin plus a
cheap step timer that reports samples/sec — the framework's north-star
metric."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

from mopoe_mimic_tpu.utils.logger import log


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture an xplane trace viewable in TensorBoard → Profile."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info(f"profiler trace written to {logdir}")


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Throughput meter: call tick(batch_size) once per step; read
    samples_per_sec over the tail window (compile steps excluded by
    skipping the first `warmup` ticks)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._ticks = 0
        self._samples = 0
        self._t0: Optional[float] = None

    def tick(self, batch_size: int) -> None:
        self._ticks += 1
        if self._ticks == self.warmup:
            self._t0 = time.perf_counter()
        elif self._ticks > self.warmup:
            self._samples += batch_size

    @property
    def samples_per_sec(self) -> float:
        if self._t0 is None or self._samples == 0:
            return 0.0
        return self._samples / (time.perf_counter() - self._t0)


def device_memory_stats() -> dict:
    """Per-device HBM usage (replaces the reference's nvidia-smi parse,
    mimic/utils/flags.py:131-138)."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
