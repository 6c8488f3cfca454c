"""rng-recompute dropout (ops/rng_dropout.py): bit-identical to flax
Dropout in value AND gradient, with only the key as residual.

The knob's safety claim is structural — both paths draw the SAME
block-level key and apply the same bernoulli(keep)+select formula — so
the train step must produce bit-equal losses and gradients with the
knob on and off (VERDICT r4 #8 accept/reject protocol, step 1)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.ops.rng_dropout import rng_dropout

TINY = dict(
    dataset="testing", img_size=64, DIM_img=4, DIM_text=4, class_dim=8,
    text_encoding="word", vocab_size=60, batch_size=4,
    compute_dtype="float32",
)


@pytest.mark.parametrize("broadcast", [(), (1, 2)])
def test_value_and_grad_match_flax_dropout(broadcast):
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 8, 8, 6))

    flax_drop = nn.Dropout(rate=0.5, broadcast_dims=broadcast)

    def f_flax(x):
        return jnp.sum(
            flax_drop.apply({}, x, deterministic=False, rng=rng) ** 2
        )

    def f_ours(x):
        return jnp.sum(rng_dropout(x, rng, 0.5, broadcast) ** 2)

    v1, g1 = jax.value_and_grad(f_flax)(x)
    v2, g2 = jax.value_and_grad(f_ours)(x)
    assert v1 == v2, (v1, v2)
    assert (np.asarray(g1) == np.asarray(g2)).all()


def test_backward_residual_is_key_sized():
    """The custom VJP's saved residual is the key alone — the mask never
    persists between forward and backward."""
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((64, 128))
    _, vjp = jax.vjp(lambda t: rng_dropout(t, rng, 0.5, ()), x)
    # the residuals live in vjp's closure; total float/int payload must be
    # O(key), not O(x)
    leaves = jax.tree_util.tree_leaves(vjp)
    n_bytes = sum(np.asarray(l).nbytes for l in leaves if hasattr(l, "nbytes"))
    assert n_bytes <= 64, f"residual payload {n_bytes}B — mask was saved"


def test_train_step_bit_equal_with_knob():
    """Full jitted train step: knob on vs off → bit-equal loss (forward
    identical: same keys, same masks, same formula) and parameter updates
    equal to fp-reassociation noise (the custom-VJP backward graph fuses
    differently in XLA; measured ~1e-10 after one Adam step — see the
    accept/reject notes in config.rng_recompute_dropout)."""
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.train.state import create_train_state
    from mopoe_mimic_tpu.train.step import make_train_step

    losses = {}
    params_after = {}
    for knob in (False, True):
        cfg = MopoeConfig(**TINY, rng_recompute_dropout=knob)
        ds = SyntheticMimic(cfg, seed=0)
        batch, _ = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))
        state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
        step = make_train_step(cfg)
        for _ in range(2):
            state, metrics = step(state, batch)
        losses[knob] = float(metrics["total_loss"])
        params_after[knob] = jax.device_get(state.params)
    assert losses[False] == losses[True], losses
    flat_a = jax.tree_util.tree_leaves(params_after[False])
    flat_b = jax.tree_util.tree_leaves(params_after[True])
    worst = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(flat_a, flat_b)
    )
    assert worst < 1e-6, f"param drift {worst} beyond fp-reassociation noise"
