"""Fused BN→ReLU→pointwise-conv kernel (ops/pallas_pointwise.py,
cfg.fused_pointwise) — value/grad equality vs the unfused composition and
drop-in block/model parity. Runs the Pallas interpreter on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mopoe_mimic_tpu.ops.pallas_pointwise import (
    fused_bn_relu_pointwise,
    reference_bn_relu_pointwise,
)


@pytest.mark.parametrize(
    "shape,bias",
    [
        ((6, 5, 5, 64), False),   # 2-D image block head (no conv bias)
        ((30, 48), True),         # odd rows → padded tile; with bias
        ((4, 7, 96), True),       # 1-D text block head
    ],
)
def test_op_matches_reference_value_and_grads(shape, bias):
    C = shape[-1]
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[1], shape)
    g = jax.random.normal(ks[2], (C,)) * 0.2 + 1.0
    b = jax.random.normal(ks[3], (C,)) * 0.1
    W = jax.random.normal(ks[4], (C, C)) * 0.1
    cb = jax.random.normal(ks[5], (C,)) * 0.1 if bias else None
    eps = 1e-5

    def loss_f(x, g, b, W, cb):
        y, m, v = fused_bn_relu_pointwise(x, g, b, W, cb, eps, interpret=True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32))), (m, v)

    def loss_r(x, g, b, W, cb):
        y, m, v = reference_bn_relu_pointwise(x, g, b, W, cb, eps)
        return jnp.sum(jnp.sin(y)), (m, v)

    argnums = (0, 1, 2, 3) if cb is None else (0, 1, 2, 3, 4)
    (lf, (mf, vf)), gf = jax.value_and_grad(
        loss_f, argnums=argnums, has_aux=True)(x, g, b, W, cb)
    (lr, (mr, vr)), gr = jax.value_and_grad(
        loss_r, argnums=argnums, has_aux=True)(x, g, b, W, cb)
    np.testing.assert_allclose(lf, lr, rtol=1e-5)
    # stats must be flax-exact (fast variance, f32, clamped)
    np.testing.assert_allclose(mf, mr, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(vf, vr, rtol=1e-6, atol=1e-6)
    for a, r in zip(gf, gr):
        # the custom VJP implements the full train-mode BN backward
        # (stats' dependence on x included) — compare against autodiff
        np.testing.assert_allclose(a, r, rtol=3e-4, atol=3e-5)


def test_op_stats_match_flax_batchnorm():
    import flax.linen as nn

    x = jax.random.normal(jax.random.PRNGKey(2), (16, 6, 32))
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v = bn.init(jax.random.PRNGKey(0), x)
    _, upd = bn.apply(v, x, mutable=["batch_stats"])
    _, mean, var = fused_bn_relu_pointwise(
        x, v["params"]["scale"], v["params"]["bias"],
        jnp.eye(32), None, 1e-5, interpret=True)
    ra_mean = 0.9 * v["batch_stats"]["mean"] + 0.1 * mean
    ra_var = 0.9 * v["batch_stats"]["var"] + 0.1 * var
    # atol: jnp.mean over the flattened rows vs flax's mean over (0, 1)
    # reduce in different orders — near-zero means see ~1e-8 float noise
    np.testing.assert_allclose(
        ra_mean, upd["batch_stats"]["mean"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        ra_var, upd["batch_stats"]["var"], rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("cls_name,kwargs,shape", [
    ("ResidualBlockConv",
     dict(features=128, channelwise_dropout=True, use_conv_bias=False),
     (8, 16, 16, 64)),
    ("ResidualBlockTransposeConv", dict(features=32, output_padding=1),
     (8, 12, 64)),
])
def test_block_fused_is_dropin(cls_name, kwargs, shape):
    """fused_pointwise=True must be a drop-in for the unfused block:
    identical parameter/batch-stats tree (checkpoint + torch-importer
    compatibility), matching train forward/grads/stat updates (with live
    dropout — the rng stream alignment matters) and eval forward."""
    from mopoe_mimic_tpu.models import resblocks

    cls = getattr(resblocks, cls_name)
    unf = cls(**kwargs)
    fus = cls(fused_pointwise=True, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(1), shape)
    k = jax.random.PRNGKey(0)
    vu = unf.init({"params": k}, x, True)
    vf = fus.init({"params": k}, x, True)
    su = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), vu)
    sf = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), vf)
    assert jax.tree_util.tree_structure(su) == jax.tree_util.tree_structure(sf)
    assert su == sf

    def run(mod):
        def loss(p):
            y, upd = mod.apply(
                {"params": p, "batch_stats": vu["batch_stats"]}, x, True,
                mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(7)},
            )
            return jnp.sum(jnp.tanh(y.astype(jnp.float32))), (y, upd)
        (l, (y, upd)), g = jax.value_and_grad(loss, has_aux=True)(vu["params"])
        return l, y, upd, g

    lu, yu, uu, gu = run(unf)
    lf, yf, uf, gf = run(fus)
    np.testing.assert_allclose(yu, yf, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(lu, lf, rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-5), uu, uf)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4), gu, gf)
    np.testing.assert_allclose(
        unf.apply(vu, x, False), fus.apply(vu, x, False), rtol=2e-4, atol=2e-5)


@pytest.mark.slow  # >30s on the 1-core box; excluded from the fast gate
def test_train_step_loss_parity_fused_pointwise():
    """Whole-model check: a jitted train step with cfg.fused_pointwise
    tracks the unfused step's loss from identical init over several
    steps (f32 compute on CPU — tolerances are fp-accumulation only)."""
    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.train.state import create_train_state
    from mopoe_mimic_tpu.train.step import make_train_step

    def run(fused):
        cfg = MopoeConfig(
            method="joint_elbo", dataset="testing", img_size=64,
            DIM_img=8, DIM_text=8, class_dim=8, text_encoding="word",
            vocab_size=96, batch_size=4, initial_learning_rate=1e-4,
            fused_pointwise=fused,
        )
        ds = SyntheticMimic(cfg, seed=0, length=8)
        batches = [b for b, _ in BatchLoader(ds, 4, shuffle=False)]
        state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
        step = jax.jit(make_train_step(cfg))
        losses = []
        for i in range(4):
            state, metrics = step(state, batches[i % len(batches)])
            losses.append(float(metrics["total_loss"]))
        return losses

    lu = run(False)
    lf = run(True)
    # step 0 sees one identical-params forward (fp-accumulation tolerance
    # only); later steps compound optimizer-state drift
    np.testing.assert_allclose(lu[0], lf[0], rtol=2e-4)
    np.testing.assert_allclose(lu, lf, rtol=1e-2)
