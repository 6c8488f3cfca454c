"""End-to-end training-loop integration on the synthetic dataset (parity
with the reference's central integration test,
mimic/tests/test_training.py:19-123, at CPU-budget scale): 2 epochs × 2
steps through Experiment → run_epochs → callbacks → CSV/TB sinks, plus
checkpoint/resume round-trip."""

import json
import os

import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.experiment import Experiment
from mopoe_mimic_tpu.train.loop import run_epochs


def _cfg(tmp_path, **kw):
    base = dict(
        method="joint_elbo", dataset="testing", batch_size=8, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=50, compute_dtype="float32", end_epoch=2,
        steps_per_training_epoch=2, eval_freq=10, seed=3,
        dir_experiment=str(tmp_path),
    )
    base.update(kw)
    return MopoeConfig(**base)


@pytest.mark.slow
def test_run_epochs_end_to_end(tmp_path):
    cfg = _cfg(tmp_path)
    exp = Experiment(cfg)
    result = run_epochs(exp)
    assert np.isfinite(result["test"]["total_loss"])
    assert result["mean_epoch_time"] > 0
    # results CSV exists with our row and metrics merged in
    csv = os.path.join(cfg.dir_experiment, "experiments_dataframe.csv")
    assert os.path.exists(csv)
    import pandas as pd

    df = pd.read_csv(csv)
    assert (df["str_experiment"] == exp.name).any()
    assert "mean_epoch_time" in df.columns
    # config persisted for --load_flags
    with open(os.path.join(exp.paths["experiment_run"], "config.json")) as f:
        saved = json.load(f)
    assert saved["method"] == "joint_elbo"
    # run dir tree (filehandling parity)
    for key in ("checkpoints", "logs", "plot_random"):
        assert os.path.isdir(exp.paths[key])


@pytest.mark.slow
def test_checkpoint_resume_roundtrip(tmp_path):
    cfg = _cfg(tmp_path, end_epoch=1, checkpoint_freq=1)
    exp = Experiment(cfg)
    result = run_epochs(exp)
    assert exp.checkpoints.latest_epoch() == 0
    # restore into a fresh state template
    template = exp.init_state()
    epoch, restored = exp.checkpoints.restore(template)
    assert epoch == 0
    trained = result["state"]
    import jax

    a = jax.tree_util.tree_leaves(jax.device_get(trained.params))[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert int(restored.step) == int(trained.step)
