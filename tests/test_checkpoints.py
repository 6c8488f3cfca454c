"""Checkpoint retention: best-k by test loss + always-latest (the
reference never evicts-by-quality — it has no resume at all; see
utils/checkpoints.py docstring)."""

import numpy as np
import pytest

from mopoe_mimic_tpu.utils.checkpoints import CheckpointManager


def _state(v: float):
    return {"params": {"w": np.full((3,), v, dtype=np.float32)}, "step": int(v)}


def test_saves_are_durable_without_close(tmp_path):
    """Each queued save must be COMMITTED once its queue item completes —
    a crash after that point (no close/wait_until_finished) must not lose
    the step. Regression: orbax's internal async layer under our queue
    left steps uncommitted until the next sync point; a 65k run
    OOM-killed during final evals lost both its boundary checkpoints to
    orbax's uncommitted-step GC on reopen."""
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(9, _state(9.0), metrics={"test_loss": 5.0})
    mgr.save(11, _state(11.0), metrics={"test_loss": 3.0})
    mgr._queue.join()  # our queue drained — NOT orbax's sync point
    # simulate a crash: abandon the manager without close(); a fresh
    # manager (as serve.py / resume would build) must see both steps
    fresh = CheckpointManager(str(tmp_path / "ck"))
    assert sorted(fresh.all_epochs()) == [9, 11]
    ep, restored = fresh.restore(_state(0.0), epoch=11)
    assert ep == 11 and restored["params"]["w"][0] == 11.0
    fresh.close()


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


def test_staged_best_flushes_on_read_and_supersede(tmp_path):
    """stage() holds the pending best with no write; a newer stage
    replaces it; any read API flushes it to disk first; save() of a
    newer epoch flushes the older staged entry (orbax steps stay
    monotonic)."""
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    mgr.save(0, _state(0.0), metrics={"test_loss": 9.0})
    mgr.stage(1, _state(1.0), {"test_loss": 5.0})
    mgr.stage(2, _state(2.0), {"test_loss": 3.0})  # supersedes epoch 1
    # read flushes: epoch 2 lands, epoch 1 never written
    assert mgr.latest_epoch() == 2
    assert 1 not in mgr.all_epochs()
    assert mgr.best_epoch() == 2
    # an older staged best flushes before a newer direct save
    mgr.stage(3, _state(3.0), {"test_loss": 2.0})
    mgr.save(4, _state(4.0), metrics={"test_loss": 4.0})
    kept = set(mgr.all_epochs())
    assert 3 in kept and 4 in kept
    ep, restored = mgr.restore(_state(0.0), epoch=3)
    assert restored["params"]["w"][0] == 3.0
    mgr.close()


def test_staged_and_queued_states_survive_buffer_donation(tmp_path):
    # Under cfg.donate_state the next train dispatch DELETES the previous
    # state's device buffers, so stage()/async save() must snapshot to
    # fresh buffers (a bare reference crashed the 65k rehearsal's final
    # flush: "Array has been deleted"). Simulate donation by explicitly
    # deleting the source arrays after handing the state over.
    import jax.numpy as jnp

    def dev_state(v: float):
        return {"params": {"w": jnp.full((3,), v, dtype=jnp.float32)},
                "step": jnp.asarray(int(v))}

    mgr = CheckpointManager(str(tmp_path / "ck"))
    s1 = dev_state(1.0)
    mgr.stage(1, s1, metrics={"test_loss": 3.0})
    for leaf in [s1["params"]["w"], s1["step"]]:
        leaf.delete()  # what donation does to the staged original

    s2 = dev_state(2.0)
    mgr.save(2, s2, metrics={"test_loss": 2.5})  # async enqueue
    for leaf in [s2["params"]["w"], s2["step"]]:
        leaf.delete()  # donation racing the async download

    assert set(mgr.all_epochs()) == {1, 2}  # drains + flushes first
    _, restored = mgr.restore(dev_state(0.0), epoch=1)
    assert float(np.asarray(restored["params"]["w"])[0]) == 1.0
    _, restored = mgr.restore(dev_state(0.0), epoch=2)
    assert float(np.asarray(restored["params"]["w"])[0]) == 2.0
    mgr.close()


def test_staged_best_persisted_by_close(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    mgr.stage(5, _state(5.0), {"test_loss": 1.0})
    mgr.close()
    mgr2 = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    assert mgr2.latest_epoch() == 5
    mgr2.close()
