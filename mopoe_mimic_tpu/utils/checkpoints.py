"""Orbax checkpointing with true resume and best-k retention.

The reference saves per-network state_dicts every 50 epochs
(mimic/utils/experiment.py:388-402) but never saves optimizer state and
has no resume wiring (SURVEY.md §5). Here the whole TrainState (params,
batch_stats, opt_state, step, rng) plus the epoch index round-trips
through orbax.

Retention = best-k by test loss PLUS always the latest:
  * ``BestN(n=max_to_keep)`` on the ``test_loss`` metric — a long plateau
    can never evict the best checkpoint;
  * ``LatestN(1)`` — resume-from-latest always works even when the latest
    epoch is not among the best.
Saves without a metric (periodic/final saves before any test pass) are
retained by BestN's keep_checkpoints_without_metrics.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp
from orbax.checkpoint.checkpoint_managers import preservation_policy as _pp

from mopoe_mimic_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        policy = _pp.AnyPreservationPolicy(policies=[
            # reverse=True sorts descending so the n *lowest* losses survive
            _pp.BestN(get_metric_fn=_get_test_loss, reverse=True, n=max_to_keep),
            _pp.LatestN(n=1),
        ])
        self._mgr = ocp.CheckpointManager(
            Path(directory).absolute(),
            options=ocp.CheckpointManagerOptions(
                preservation_policy=policy,
                best_fn=_get_test_loss,
                best_mode="min",
                create=True,
            ),
        )

    def save(
        self,
        epoch: int,
        state: TrainState,
        force: bool = False,
        metrics: Optional[Dict[str, Any]] = None,
    ) -> None:
        if jax.process_index() != 0:
            return  # rank-0-only semantics (experiment.py:391-393)
        self._mgr.save(
            epoch,
            args=ocp.args.StandardSave(jax.device_get(state)),
            metrics=metrics,
            force=force,
        )
        self._mgr.wait_until_finished()

    def restore(
        self, state_template: TrainState, epoch: Optional[int] = None
    ) -> Tuple[int, TrainState]:
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(jax.device_get(state_template))
        )
        return step, restored

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_epoch(self) -> Optional[int]:
        """Epoch of the lowest recorded test loss among retained
        checkpoints (None when no save carried metrics)."""
        return self._mgr.best_step()

    def all_epochs(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.close()


def _get_test_loss(metrics) -> float:
    return float(metrics["test_loss"])
