"""lr-warmup stability mitigation (VERDICT r3 #3 / docs/STABILITY.md).

The reference architecture's encoder tails end in BatchNorm at 1×1
spatial; on weakly structured inputs their batch variance collapses
toward eps and Adam's first ±lr sign-steps at the reference lr 5e-4 push
the logvar head past exp() overflow (docs/STABILITY.md — the exact mode
the reference's NaN-restart supervision exists for,
main_mimic.py:100-124). `lr_warmup_steps` ramps the update scale 1/N → 1
so the dangerous first steps shrink to lr/N while the BN statistics
calibrate. This test pins BOTH sides at flagship-ish shapes on the
worst-case noise fixture: without warmup the run diverges within a few
steps; with warmup the identical run trains.
"""

import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.train.state import create_train_state, make_optimizer
from mopoe_mimic_tpu.train.step import make_train_step


def _losses(warmup_steps: int, steps: int = 30):
    import jax

    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", img_size=64, DIM_img=64,
        DIM_text=64, class_dim=64, text_encoding="word", vocab_size=100,
        batch_size=16, compute_dtype="float32",
        initial_learning_rate=5e-4,  # the reference's canonical lr
        lr_warmup_steps=warmup_steps, seed=0,
    )
    ds = SyntheticMimic(cfg, seed=0, length=4 * cfg.batch_size)
    batches = [b for b, _ in BatchLoader(ds, cfg.batch_size, shuffle=False)]
    state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
    step = make_train_step(cfg, tx=make_optimizer(cfg))
    losses = []
    for i in range(steps):
        state, m = step(state, batches[i % len(batches)])
        losses.append(float(jax.device_get(m["total_loss"])))
        if not np.isfinite(losses[-1]):
            break
    return np.asarray(losses)


@pytest.mark.slow
def test_lr5e4_diverges_without_warmup_and_trains_with_it():
    bare = _losses(warmup_steps=0)
    assert not np.isfinite(bare).all(), (
        "expected the documented lr-5e-4 divergence on the noise fixture "
        "(docs/STABILITY.md) — did the architecture change?"
    )
    warm = _losses(warmup_steps=100)
    assert np.isfinite(warm).all(), warm
    assert warm[-1] < warm[0], warm  # and it actually trains
