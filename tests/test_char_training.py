"""Trimodal training with char-encoded text (the reference's default,
--text_encoding char → len_sequence 1024, one-hot 71)."""

import jax
import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.train import create_train_state, make_train_step


@pytest.mark.slow
def test_char_trimodal_train_step():
    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", batch_size=4, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="char",
        compute_dtype="float32",
    )
    assert cfg.len_sequence == 1024 and cfg.num_features == 71
    ds = SyntheticMimic(cfg, seed=0)
    batch = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))[0]
    assert batch["text"].shape == (4, 1024, 71)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert not bool(metrics["nan_in_latents"])
