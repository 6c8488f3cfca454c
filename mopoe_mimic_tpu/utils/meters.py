"""Epoch-level metric aggregation.

Replaces AverageMeter/AverageMeterDict/AverageMeterLatents
(mimic/utils/average_meters.py) with one pytree accumulator: the train loop
sums metric pytrees on device and divides once per epoch — no per-step
`.item()` host syncs (the reference syncs every batch,
run_epochs.py:133-142; SURVEY.md §7 flags this as a main throughput lever).

Note the reference's scalar AverageMeter.get_average returns the *last*
value, not the mean (average_meters.py:33-34) — a bug we do not reproduce;
this accumulator returns true means for everything.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def fetch_scalar_tree(tree: Any) -> Any:
    """Device pytree of scalars → host pytree of floats in TWO RPCs.

    ``jax.device_get`` on a pytree issues one transfer RPC per leaf; over
    the thin host↔device link each costs tens of ms, so a ~21-leaf epoch
    metric tree costs ~0.3-0.7 s per read. Stacking the scalar leaves
    into one vector on device (one dispatch) and fetching that (one
    transfer) makes the read O(1) in leaf count. Falls back to plain
    device_get when any leaf is non-scalar or already on host."""
    leaves, td = jax.tree_util.tree_flatten(tree)
    if not leaves or not all(
        isinstance(l, jax.Array) and l.ndim == 0 for l in leaves
    ):
        return jax.device_get(tree)
    flat = np.asarray(jnp.stack([l.astype(jnp.float32) for l in leaves]))
    return td.unflatten([float(v) for v in flat])


class MetricAccumulator:
    """Accumulates metric pytrees (device arrays) and averages on read."""

    def __init__(self):
        self._sum: Optional[Any] = None
        self._count: int = 0

    def update(self, metrics: Any) -> None:
        if self._sum is None:
            self._sum = metrics
        else:
            self._sum = jax.tree_util.tree_map(lambda a, b: a + b, self._sum, metrics)
        self._count += 1

    def averages(self) -> Any:
        """One device→host read for the whole epoch (fetch_scalar_tree)."""
        if self._sum is None:
            return {}
        host = fetch_scalar_tree(self._sum)
        return jax.tree_util.tree_map(
            lambda a: np.asarray(a, dtype=np.float64) / self._count, host
        )

    @property
    def count(self) -> int:
        return self._count


def flatten_metrics(d: Any, prefix: str = "", sep: str = "/") -> Dict[str, float]:
    """Nested metrics pytree → flat {name: float} for TB/CSV sinks
    (parity with utils.flatten, mimic/utils/utils.py:240-248)."""
    out: Dict[str, float] = {}

    def rec(node, name):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{name}{sep}{k}" if name else str(k))
        elif isinstance(node, (tuple, list)):
            for i, v in enumerate(node):
                rec(v, f"{name}{sep}{i}")
        elif node is None:
            return
        elif isinstance(node, str):
            out[name] = node  # pass labels/modality names through to CSV
        else:
            arr = np.asarray(node)
            if arr.ndim == 0:
                out[name] = float(arr)
            else:
                for i, v in enumerate(arr.ravel()):
                    out[f"{name}{sep}{i}"] = float(v)

    rec(d, prefix)
    return out
