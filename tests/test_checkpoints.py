"""Checkpoint retention: best-k by test loss + always-latest (the
reference never evicts-by-quality — it has no resume at all; see
utils/checkpoints.py docstring)."""

import numpy as np
import pytest

from mopoe_mimic_tpu.utils.checkpoints import CheckpointManager


def _state(v: float):
    return {"params": {"w": np.full((3,), v, dtype=np.float32)}, "step": int(v)}


def test_plateau_never_evicts_best(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    # improving, then a long plateau of worse losses
    losses = [5.0, 2.0, 4.0, 4.5, 4.6, 4.7, 4.8]
    for epoch, l in enumerate(losses):
        mgr.save(epoch, _state(float(epoch)), metrics={"test_loss": l})
    kept = set(mgr.all_epochs())
    assert 1 in kept, "best checkpoint (epoch 1, loss 2.0) was evicted"
    assert mgr.best_epoch() == 1
    assert mgr.latest_epoch() == len(losses) - 1
    assert len(losses) - 1 in kept, "latest must survive for resume"
    # restore best and latest round-trip
    ep, restored = mgr.restore(_state(0.0), epoch=mgr.best_epoch())
    assert ep == 1 and restored["params"]["w"][0] == 1.0
    ep, restored = mgr.restore(_state(0.0))
    assert ep == len(losses) - 1
    mgr.close()


def test_metricless_saves_are_retained(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=1)
    mgr.save(0, _state(0.0))  # periodic save before any test pass
    mgr.save(1, _state(1.0), metrics={"test_loss": 3.0})
    assert 0 in mgr.all_epochs()
    mgr.close()
