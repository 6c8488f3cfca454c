"""The eval suite must DISCRIMINATE model quality (VERDICT r3 #4).

All round-3 synthetic eval numbers saturated (lr-eval AP 1.0, coherence
0.9998) because the structured fixture was perfectly separable — metrics
that always read 1.0 can't catch a broken model. With
``synthetic_noise > 0`` the class→modality mapping is corrupted
per-channel, so (a) the metrics land mid-range, and (b) they must RANK a
barely-trained model below a longer-trained one. Metric semantics match
the reference coherence/representation pipeline
(mimic/evaluation/eval_metrics/representation.py,
coherence.py:204-293).
"""

import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
# aliased on import: pytest would otherwise collect the library function
# `test_clf_lr_all_subsets` (reference-parity name, representation.py:91
# upstream) as a test and ERROR on its missing fixtures, aborting -x lanes
from mopoe_mimic_tpu.evaluation.representation import (
    test_clf_lr_all_subsets as eval_clf_lr_all_subsets,
    train_clf_lr_all_subsets,
)
from mopoe_mimic_tpu.experiment import Experiment
from mopoe_mimic_tpu.train.loop import run_epochs


def _mean_ap(lr_eval):
    vals = [m["mean_AP_total"] for m in lr_eval.values()]
    return float(np.mean(vals))


@pytest.mark.slow
def test_lr_eval_ranks_undertrained_below_trained(tmp_path):
    base = dict(
        method="joint_elbo", dataset="testing_structured",
        synthetic_classes=3, synthetic_noise=0.25, synthetic_length=256,
        batch_size=16, class_dim=8, DIM_img=4, DIM_text=4, img_size=64,
        text_encoding="word", vocab_size=50, compute_dtype="float32",
        eval_freq=1000, seed=5, dir_experiment=str(tmp_path),
        initial_learning_rate=1e-3,
    )

    def train_and_eval(epochs):
        cfg = MopoeConfig(**base, end_epoch=epochs)
        exp = Experiment(cfg)
        result = run_epochs(exp)
        state = result["state"]
        clf = train_clf_lr_all_subsets(exp, state)
        lr_eval = eval_clf_lr_all_subsets(exp, state, clf)
        return _mean_ap(lr_eval), float(result["test"]["total_loss"])

    ap_short, loss_short = train_and_eval(1)
    ap_long, loss_long = train_and_eval(20)
    print(f"\nmean_AP: 1 epoch={ap_short:.3f}  20 epochs={ap_long:.3f}  "
          f"(test loss {loss_short:.1f} → {loss_long:.1f})")
    # mid-range, not saturated: the noisy fixture caps what any model can
    # reach, and a 10-epoch tiny model shouldn't hit that ceiling either
    assert ap_long < 0.995, "metric saturated — fixture not discriminative"
    assert ap_long > 0.45, "metric at chance — fixture carries no signal"
    # and the metric RANKS quality: more training → better representation
    assert ap_long > ap_short + 0.02, (ap_short, ap_long)


def test_noise_knob_desaturates_fixture():
    """The corrupted channels disagree with the true class at ~the
    configured rate, independently per channel (fast sanity check)."""
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic

    cfg = MopoeConfig(dataset="testing_structured", batch_size=8,
                      img_size=64, text_encoding="word", vocab_size=50,
                      synthetic_classes=3)
    ds = SyntheticMimic(cfg, seed=0, length=600, structured=True,
                        n_classes=3, noise=0.3)
    text_cls = ds.arrays["text"][:, 0] - 1
    label_cls = ds.labels.argmax(1)
    mismatch_text = float((text_cls != ds.classes).mean())
    mismatch_label = float((label_cls != ds.classes % 3).mean())
    # corruption draws a uniform class, so visible disagreement ≈ p·(k-1)/k
    assert 0.1 < mismatch_text < 0.3
    assert 0.1 < mismatch_label < 0.3
    # channels corrupted independently (not the same rows)
    both = float(((text_cls != ds.classes) & (label_cls != ds.classes % 3)).mean())
    assert both < 0.12
    # noise=0 keeps the original perfectly separable contract
    clean = SyntheticMimic(cfg, seed=0, length=100, structured=True,
                           n_classes=3, noise=0.0)
    assert (clean.arrays["text"][:, 0] - 1 == clean.classes).all()
