"""Orbax checkpointing with true resume.

The reference saves per-network state_dicts every 50 epochs
(mimic/utils/experiment.py:388-402) but never saves optimizer state and
has no resume wiring (SURVEY.md §5). Here the whole TrainState (params,
batch_stats, opt_state, step, rng) plus the epoch index round-trips
through orbax, with best-k retention.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from mopoe_mimic_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            Path(directory).absolute(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, epoch: int, state: TrainState, force: bool = False) -> None:
        if jax.process_index() != 0:
            return  # rank-0-only semantics (experiment.py:391-393)
        self._mgr.save(
            epoch, args=ocp.args.StandardSave(jax.device_get(state)), force=force
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

    def close(self):
        self._mgr.close()
