"""Preemption REHEARSAL (VERDICT r3 #9): a run preempted mid-training and
resumed via run-dir reattachment must land on EXACTLY the state an
uninterrupted run reaches.

The SIGTERM→guard wiring itself is unit-tested in tests/test_preemption.py;
this drives the full semantics end-to-end: train → preempt at an epoch
boundary (checkpoint written) → fresh Experiment reattached to the SAME
run dir (the --load_run path main.py takes) → resume → finish — and pins
the final parameters bitwise against a never-interrupted control run.
Bitwise equality holds because everything the trajectory depends on is
checkpointed (params, opt_state, BN stats, step, train rng) and the epoch
shuffle is (seed, epoch)-keyed, not stateful.
"""

import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.experiment import Experiment
from mopoe_mimic_tpu.train.loop import run_epochs


class _GuardAfterEpochs:
    """Preemption guard double: 'SIGTERM arrives' after N epoch-boundary
    checks (the loop reads .requested exactly once per epoch)."""

    def __init__(self, after: int):
        self.after = after
        self.checks = 0

    @property
    def requested(self) -> bool:
        self.checks += 1
        return self.checks > self.after


def _cfg(tmp_path, **kw):
    base = dict(
        method="joint_elbo", dataset="testing", batch_size=8, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=50, compute_dtype="float32", end_epoch=4,
        steps_per_training_epoch=2, eval_freq=1000, seed=11,
        checkpoint_freq=100, dir_experiment=str(tmp_path),
    )
    base.update(kw)
    return MopoeConfig(**base)


@pytest.mark.slow
def test_preempt_resume_matches_uninterrupted(tmp_path):
    import jax

    # control: 4 epochs straight through
    cfg = _cfg(tmp_path / "control")
    exp_c = Experiment(cfg)
    control = run_epochs(exp_c, preemption=None)
    assert control["epochs_run"] == 4 and not control["preempted"]

    # preempted run: SIGTERM lands after epoch 1's boundary check
    cfg_p = _cfg(tmp_path / "preempted")
    exp_p = Experiment(cfg_p)
    first = run_epochs(exp_p, preemption=_GuardAfterEpochs(1))
    assert first["preempted"] is True
    assert first["epochs_run"] == 2  # epochs 0 and 1 ran, then checkpoint
    assert exp_p.checkpoints.latest_epoch() == 1

    # resume exactly the way main.py --load_run does: reattach a FRESH
    # Experiment to the same run dir and restore from its checkpoints
    exp_r = Experiment(cfg_p, name=exp_p.name)
    resumed = run_epochs(exp_r, resume=True, preemption=None)
    assert resumed["epochs_run"] == 2  # epochs 2 and 3
    assert not resumed["preempted"]

    # the resumed trajectory must land on the control's exact state
    flat_c = jax.tree_util.tree_leaves(jax.device_get(control["state"].params))
    flat_r = jax.tree_util.tree_leaves(jax.device_get(resumed["state"].params))
    assert len(flat_c) == len(flat_r)
    for a, b in zip(flat_c, flat_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    bs_c = jax.tree_util.tree_leaves(jax.device_get(control["state"].batch_stats))
    bs_r = jax.tree_util.tree_leaves(jax.device_get(resumed["state"].batch_stats))
    for a, b in zip(bs_c, bs_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(control["state"].step) == int(resumed["state"].step)
    # train-pass metrics of the final epoch agree too
    assert control["train"]["total_loss"] == resumed["train"]["total_loss"]
    # and the run's CSV row was reused, not duplicated, across the resume
    import os

    import pandas as pd

    df = pd.read_csv(os.path.join(cfg_p.dir_experiment,
                                  "experiments_dataframe.csv"))
    assert (df["str_experiment"] == exp_p.name).sum() == 1
