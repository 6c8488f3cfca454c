import pytest
"""Factorized representation (style + content latents, the reference's
--factorized_representation / style dims path,
VAEtrimodalMimic.py:49-53, losses.py:34-51)."""

import jax
import numpy as np

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.models.mmvae import MMVae
from mopoe_mimic_tpu.train import create_train_state, make_train_step


def _cfg():
    return MopoeConfig(
        method="joint_elbo", dataset="testing", batch_size=8, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=50, compute_dtype="float32",
        factorized_representation=True,
        style_pa_dim=3, style_lat_dim=3, style_text_dim=3,
    )


@pytest.mark.slow
def test_factorized_forward_and_train():
    cfg = _cfg()
    ds = SyntheticMimic(cfg, seed=0)
    batch = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))[0]
    model = MMVae(cfg)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "reparam": jax.random.PRNGKey(2),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(rngs, batch)
    out, _ = model.apply(
        variables, batch, train=True,
        rngs={"reparam": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    styles = out["latents"]["styles"]
    assert set(styles.keys()) == {"PA", "Lateral", "text"}
    assert styles["PA"][0].shape == (cfg.batch_size, 3)

    # train step carries style KLDs in the metrics
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert set(metrics["klds_style"].keys()) == {"PA", "Lateral", "text"}


def test_factorized_generation_uses_random_styles():
    cfg = _cfg()
    ds = SyntheticMimic(cfg, seed=0)
    batch = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))[0]
    model = MMVae(cfg)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "reparam": jax.random.PRNGKey(2),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(rngs, batch)
    gen = model.apply(
        variables, 4, train=False, rngs={"reparam": jax.random.PRNGKey(5)},
        method=lambda m, n, train: m.generate(n, train=train),
    )
    assert gen["PA"].shape == (4, 64, 64, 1)
