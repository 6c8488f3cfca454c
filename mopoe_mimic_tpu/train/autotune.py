"""Batch-size handling for device memory — the TPU-native analog of the
reference's CUDA-OOM retry loops (mimic/main_mimic.py:116-121 ×0.8,
classifiers/main_train_clf_mimic.py:187-198 ×0.7).

On TPU, memory exhaustion surfaces at COMPILE time (XLA plans all buffers
statically), which enables something the reference cannot do: probe the
memory plan without executing a step. ``autotune_batch_size`` doubles the
batch until the AOT-compiled train step's planned bytes
(``compiled.memory_analysis()``) exceed a budget fraction of device
memory, then returns the largest fitting power-of-two multiple.

``is_oom_error`` classifies runtime/compile errors so the driver's
backoff (main.py) actually catches XLA's RESOURCE_EXHAUSTED, which is not
a MemoryError subclass.
"""

from __future__ import annotations

from typing import Callable, Optional

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.utils.exceptions import DeviceOutOfMemory
from mopoe_mimic_tpu.utils.logger import log

_OOM_MARKERS = (
    "RESOURCE_EXHAUSTED",
    "RESOURCE EXHAUSTED",
    "Out of memory",
    "out of memory",
    "OOM",
    "Allocation failure",
)


def is_oom_error(e: BaseException) -> bool:
    """True when an exception is a device/compile memory exhaustion."""
    if isinstance(e, (DeviceOutOfMemory, MemoryError)):
        return True
    return any(m in str(e) for m in _OOM_MARKERS)


def device_memory_bytes(device=None) -> Optional[int]:
    """HBM capacity of one device, None when the backend doesn't report it
    (e.g. CPU)."""
    import jax

    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return None
    return stats.get("bytes_limit") or stats.get("bytes_reservable_limit")


def step_memory_bytes(cfg: MopoeConfig) -> int:
    """Planned device bytes of one compiled train step at cfg.batch_size:
    arguments + outputs + XLA temporaries (AOT memory analysis; nothing
    executes)."""
    import jax

    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.train.state import create_train_state
    from mopoe_mimic_tpu.train.step import make_train_step

    ds = SyntheticMimic(cfg, seed=0, length=cfg.batch_size)
    batch, _ = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))
    state = jax.eval_shape(
        lambda: create_train_state(cfg, jax.random.PRNGKey(0), batch)
    )
    step = make_train_step(cfg.replace(donate_state=False))
    compiled = jax.jit(lambda s, b: step(s, b)).lower(state, batch).compile()
    mem = compiled.memory_analysis()
    if mem is None:  # backend without memory analysis
        raise DeviceOutOfMemory("memory analysis unavailable on this backend")
    return int(
        getattr(mem, "argument_size_in_bytes", 0)
        + getattr(mem, "output_size_in_bytes", 0)
        + getattr(mem, "temp_size_in_bytes", 0)
    )


def autotune_batch_size(
    cfg: MopoeConfig,
    max_batch: int = 4096,
    budget_fraction: float = 0.9,
    memory_bytes: Optional[int] = None,
    probe_fn: Optional[Callable[[MopoeConfig], int]] = None,
) -> int:
    """Largest power-of-two multiple of cfg.batch_size whose compiled step
    fits in ``budget_fraction`` of device memory. Falls back to
    cfg.batch_size when the backend reports no memory capacity.

    probe_fn(cfg) -> planned bytes; injectable for tests.
    """
    probe_fn = probe_fn or step_memory_bytes
    memory_bytes = memory_bytes if memory_bytes is not None else device_memory_bytes()
    if not memory_bytes:
        log.info("autotune: device reports no memory capacity; keeping "
                 f"batch_size={cfg.batch_size}")
        return cfg.batch_size
    budget = budget_fraction * memory_bytes

    best = None
    bs = cfg.batch_size
    while bs <= max_batch:
        try:
            planned = probe_fn(cfg.replace(batch_size=bs))
        except Exception as e:
            if is_oom_error(e):
                log.info(f"autotune: batch {bs} fails to compile (OOM)")
                break
            raise
        log.info(f"autotune: batch {bs} plans {planned / 2**30:.2f} GiB "
                 f"(budget {budget / 2**30:.2f} GiB)")
        if planned > budget:
            break
        best = bs
        bs *= 2
    if best is None:
        raise DeviceOutOfMemory(
            f"even batch_size={cfg.batch_size} exceeds the memory budget"
        )
    return best
