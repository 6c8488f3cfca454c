"""Preemption-safe training (utils/preemption.py): SIGTERM-style notices
checkpoint at the next epoch boundary, exit clean, and resume — a
capability the reference lacks entirely (SURVEY.md §5: "no preemption
handling")."""

import os
import signal
import threading

import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.experiment import Experiment
from mopoe_mimic_tpu.train.loop import run_epochs
from mopoe_mimic_tpu.utils.preemption import PreemptionGuard


def _cfg(tmp_path, **kw):
    base = dict(
        method="joint_elbo", dataset="testing", batch_size=8, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=50, compute_dtype="float32", end_epoch=50,
        steps_per_training_epoch=1, eval_freq=1000, seed=3,
        dir_experiment=str(tmp_path), checkpoint_freq=1000,
    )
    base.update(kw)
    return MopoeConfig(**base)


def test_guard_latches_and_chains_previous_handler():
    seen = []
    prev = signal.signal(signal.SIGUSR1, lambda s, f: seen.append(s))
    try:
        guard = PreemptionGuard(signals=(signal.SIGUSR1,)).install()
        assert not guard.requested
        os.kill(os.getpid(), signal.SIGUSR1)
        assert guard.requested
        assert seen == [signal.SIGUSR1], "previous handler must be chained"
        guard.uninstall()
        # after uninstall the old handler is back and the guard is inert
        os.kill(os.getpid(), signal.SIGUSR1)
        assert seen == [signal.SIGUSR1, signal.SIGUSR1]
    finally:
        signal.signal(signal.SIGUSR1, prev)


def test_guard_request_off_main_thread():
    guard = PreemptionGuard()
    t = threading.Thread(target=guard.request)
    t.start()
    t.join()
    assert guard.requested


@pytest.mark.slow
def test_preempted_run_checkpoints_and_resumes(tmp_path):
    cfg = _cfg(tmp_path)
    exp = Experiment(cfg)

    # inject a guard and trip it after the second epoch finishes: the
    # loop must break at the NEXT boundary with a forced checkpoint
    guard = PreemptionGuard()
    seen_epochs = []
    orig_update = exp.tb_logger.write_epoch

    def spying_write(split, epoch, avg):
        if split == "test":
            seen_epochs.append(epoch)
            if len(seen_epochs) == 2:
                guard.request()
        return orig_update(split, epoch, avg)

    exp.tb_logger.write_epoch = spying_write
    result = run_epochs(exp, preemption=guard)
    assert result["preempted"] is True
    assert result["epochs_run"] == 2, "must stop at the boundary after the notice"
    stop_epoch = seen_epochs[-1]
    assert exp.checkpoints.latest_epoch() == stop_epoch

    # resume: picks up at stop_epoch + 1 and is NOT preempted this time
    cfg2 = _cfg(tmp_path, end_epoch=stop_epoch + 3)
    exp2 = Experiment(cfg2, name=exp.name)
    result2 = run_epochs(exp2, resume=True, preemption=None)
    assert result2["preempted"] is False
    assert result2["epochs_run"] == 2  # stop_epoch+1 .. stop_epoch+2
    assert np.isfinite(result2["test"]["total_loss"])
    exp2.checkpoints.close()
    exp.checkpoints.close()
