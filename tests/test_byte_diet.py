"""Activation byte-diet knobs (cfg.bn_compute_dtype / cfg.remat).

The flagship train step is HBM-bandwidth-bound (BENCH.md round-3:
33.9 GB accessed / 41 ms = the v5e roofline), so the remaining step-speed
levers are byte diets: BN math in the compute dtype, and per-resblock
rematerialization (``jax.checkpoint``). These tests pin the contracts:

* ``remat='blocks'`` is numerics-identical to the baseline in float32
  (same rng replay, same math, only the save/recompute schedule changes);
* ``bn_compute_dtype='compute'`` keeps loss/grads finite and close;
* invalid ``remat`` values fail loudly at model build.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mopoe_mimic_tpu.models.img_networks import EncoderImg

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
DROP = {"dropout": jax.random.PRNGKey(2)}


def _loss_and_grad(enc, x):
    variables = enc.init(RNGS, x, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    def loss_fn(p):
        (mu, lv), _ = enc.apply(
            {"params": p, "batch_stats": stats}, x, train=True,
            rngs=DROP, mutable=["batch_stats"],
        )
        return jnp.sum(mu**2) + jnp.sum(lv**2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return loss, grads


@pytest.mark.slow  # >30s on the 1-core box; excluded from the fast gate
def test_remat_blocks_is_numerics_identical_in_f32():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 1))
    base = EncoderImg(dim=2, class_dim=6, img_size=64, remat=False)
    remat = EncoderImg(dim=2, class_dim=6, img_size=64, remat=True)
    loss0, g0 = _loss_and_grad(base, x)
    loss1, g1 = _loss_and_grad(remat, x)
    assert float(loss0) == pytest.approx(float(loss1), rel=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_remat_conv_policy_is_numerics_identical_in_f32():
    # "conv": save only conv outputs (checkpoint_name tags), recompute
    # the elementwise BN/ReLU/dropout interiors. Same math, same rng
    # replay — values must match the baseline exactly like full remat.
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 1))
    base = EncoderImg(dim=2, class_dim=6, img_size=64, remat=False)
    remat = EncoderImg(dim=2, class_dim=6, img_size=64, remat="conv")
    loss0, g0 = _loss_and_grad(base, x)
    loss1, g1 = _loss_and_grad(remat, x)
    assert float(loss0) == pytest.approx(float(loss1), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_bn_compute_dtype_bf16_finite_and_close():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 1))
    base = EncoderImg(dim=2, class_dim=6, img_size=64,
                      dtype=jnp.bfloat16, bn_dtype=None)
    diet = EncoderImg(dim=2, class_dim=6, img_size=64,
                      dtype=jnp.bfloat16, bn_dtype=jnp.bfloat16)
    loss0, g0 = _loss_and_grad(base, x)
    loss1, g1 = _loss_and_grad(diet, x)
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))
    # bf16 BN output only thins activation bytes; values stay close
    assert float(loss1) == pytest.approx(float(loss0), rel=0.05)
    for g in jax.tree_util.tree_leaves(g1):
        assert np.all(np.isfinite(np.asarray(g, np.float32)))


def test_invalid_remat_mode_raises():
    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.models.mmvae import MMVae

    cfg = MopoeConfig(dataset="testing", img_size=64, DIM_img=2, DIM_text=2,
                      class_dim=4, batch_size=2, text_encoding="word",
                      vocab_size=50, remat="everything")
    batch = next(iter(BatchLoader(SyntheticMimic(cfg, seed=0),
                                  cfg.batch_size, shuffle=False)))[0]
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "reparam": jax.random.PRNGKey(2)}
    with pytest.raises(NotImplementedError, match="remat"):
        MMVae(cfg).init(rngs, batch, train=False)
