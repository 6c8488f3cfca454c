"""Optional gradient clipping + LR helpers with chained optimizer state."""

import jax
import jax.numpy as jnp
import numpy as np

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.train.state import (
    TrainState, get_learning_rate, make_optimizer, set_learning_rate,
)


def _state(cfg):
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    return tx, TrainState(
        params=params, batch_stats={}, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0),
    )


def test_lr_helpers_with_clipping_chain():
    cfg = MopoeConfig(initial_learning_rate=1e-3, grad_clip_norm=1.0)
    _, state = _state(cfg)
    assert abs(get_learning_rate(state) - 1e-3) < 1e-9
    state = set_learning_rate(state, 5e-4)
    assert abs(get_learning_rate(state) - 5e-4) < 1e-9


def test_clipping_bounds_update_norm_pre_adam():
    cfg = MopoeConfig(initial_learning_rate=1.0, beta_1=0.0, beta_2=0.0, grad_clip_norm=0.5)
    tx, state = _state(cfg)
    grads = {"w": jnp.asarray([100.0, 0.0, 0.0])}
    updates, _ = tx.update(grads, state.opt_state, state.params)
    # clip to norm 0.5 happens before adam's normalization; adam then
    # rescales to ~lr — just assert finite, correct sign
    u = np.asarray(updates["w"])
    assert np.isfinite(u).all() and u[0] < 0
