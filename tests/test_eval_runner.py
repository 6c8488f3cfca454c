"""The heavy-eval orchestrator end-to-end on the synthetic dataset: all
four eval modes produce metrics (the reference's test() analog with
use_clf/calc_nll/eval_lr/calc_prd on, mimic/tests/test_training.py:19-123)."""

import tempfile

import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.evaluation.runner import run_eval_suite
from mopoe_mimic_tpu.experiment import Experiment


def test_num_samples_fid_caps_prd_sample_count(tmp_path):
    """cfg.num_samples_fid bounds how many test samples feed FID/PRD
    (reference caps saved FID samples, coherence.py:289-291)."""
    from mopoe_mimic_tpu.evaluation.sample_quality import calc_prd_score

    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", batch_size=8, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=50, compute_dtype="float32", seed=1,
        synthetic_length=16, num_samples_fid=8,
        dir_experiment=str(tmp_path / "runs"),
    )
    exp = Experiment(cfg)
    state = exp.init_state()

    real_rows = []

    def embed(x):
        x = np.asarray(x)
        real_rows.append(x.shape[0])
        return x.reshape(x.shape[0], -1)[:, :4]

    calc_prd_score(exp, state, embed)
    # test split has 16 samples (2 batches); the cap stops after 1 batch:
    # per consumed batch the embedder sees 2 real + 2·(subsets+random) gen
    # calls, all with batch-size rows — total rows must reflect ONE batch
    n_calls_one_batch = 2 * (1 + len(exp.subsets) + 1)
    assert len(real_rows) <= n_calls_one_batch
    assert all(r == 8 for r in real_rows)


@pytest.mark.slow
def test_run_eval_suite_all_modes(tmp_path):
    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", batch_size=8, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=50, compute_dtype="float32", seed=1,
        steps_per_training_epoch=2,
        eval_lr=True, use_clf=True, calc_nll=True, calc_prd=True,
        eval_freq_fid=1, num_imp_samples=2, clf_quick_epochs=2,
        dir_experiment=str(tmp_path / "runs"), dir_clf=str(tmp_path / "clf"),
    )
    exp = Experiment(cfg)
    state = exp.init_state()
    res = run_eval_suite(exp, state, epoch=0, max_batches=1)
    assert any(k.startswith("lr_eval") for k in res)
    assert any(k.startswith("gen_eval") for k in res)
    assert any(k.startswith("likelihoods") for k in res)
    assert any(k.startswith("prd") for k in res)


def test_eval_batch_size_override(tmp_path):
    """cfg.eval_batch_size decouples the heavy-eval batch from the
    training batch (reference forces eval batch 30, run_epochs.py:188):
    eval_batches yields the override size in both loader and device-store
    modes, and the full eval suite runs green at the override."""
    base = dict(
        method="joint_elbo", dataset="testing_structured", batch_size=8,
        class_dim=4, DIM_img=2, DIM_text=2, img_size=64,
        text_encoding="word", vocab_size=50, compute_dtype="float32",
        seed=1, synthetic_length=24, eval_batch_size=6,
        clf_quick_epochs=1, eval_max_batches=2,
        eval_lr=True, calc_nll=True,
        dir_experiment=str(tmp_path / "runs"),
    )
    cfg = MopoeConfig(**base)
    assert cfg.effective_eval_batch_size == 6
    assert MopoeConfig(**{**base, "eval_batch_size": 0}).effective_eval_batch_size == 8

    exp = Experiment(cfg)
    batch, labels = next(iter(exp.eval_batches("test")))
    assert batch["PA"].shape[0] == 6 and labels.shape[0] == 6

    cfg_store = MopoeConfig(**{**base, "device_resident_data": True})
    exp_store = Experiment(cfg_store)
    sbatch, slabels = next(iter(exp_store.eval_batches("test")))
    assert sbatch["PA"].shape[0] == 6 and slabels.shape[0] == 6

    state = exp.init_state()
    results = run_eval_suite(exp, state, epoch=0)
    assert "lr_eval" in results or results, "eval suite returned nothing"
