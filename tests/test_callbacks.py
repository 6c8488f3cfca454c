"""Early-stopping / LR-plateau state machine (parity with the reference's
callback test, mimic/tests/test_callbacks.py:31-77: rising loss must stop
after patience; improving loss must keep going and checkpoint)."""

import jax.numpy as jnp
import numpy as np

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.train.callbacks import Callbacks, ReduceLROnPlateau


class _FakeCkpt:
    def __init__(self):
        self.saved = []

    def save(self, epoch, state, force=False):
        self.saved.append(epoch)


class _State:
    """Minimal stand-in for TrainState in scheduler tests."""

    def __init__(self, lr=1e-3):
        self.lr = lr


def test_early_stopping_on_rising_loss():
    cfg = MopoeConfig(max_early_stopping_index=2, end_epoch=100)
    ckpt = _FakeCkpt()
    cb = Callbacks(cfg, checkpoint_manager=ckpt)
    state = None
    stops = []
    for epoch, loss in enumerate([10.0, 9.0, 9.5, 9.6, 9.7, 9.8]):
        stop, state = cb.update_epoch(epoch, loss, state)
        stops.append(stop)
    # improvement at epoch 1; then 3 bad epochs allowed (patience 2) → stop
    # at the 3rd consecutive non-improvement (epoch 4: index becomes 3 > 2)
    assert stops == [False, False, False, False, True, True]
    # checkpoint saved on improvements
    assert 0 in ckpt.saved and 1 in ckpt.saved


def test_checkpoint_every_freq():
    cfg = MopoeConfig(max_early_stopping_index=100, checkpoint_freq=3, end_epoch=10)
    ckpt = _FakeCkpt()
    cb = Callbacks(cfg, checkpoint_manager=ckpt)
    for epoch in range(8):
        cb.update_epoch(epoch, 100.0 + epoch, None)  # never improves after 0
    assert 2 in ckpt.saved and 5 in ckpt.saved  # (epoch+1) % 3 == 0


def test_reduce_lr_on_plateau_scales_injected_lr():
    import jax
    import optax

    from mopoe_mimic_tpu.train.state import (
        TrainState, get_learning_rate, make_optimizer, set_learning_rate,
    )

    cfg = MopoeConfig(initial_learning_rate=1e-3)
    tx = make_optimizer(cfg)
    params = {"w": jnp.zeros((2,))}
    state = TrainState(
        params=params, batch_stats={}, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0),
    )
    assert abs(get_learning_rate(state) - 1e-3) < 1e-9
    sched = ReduceLROnPlateau(patience=1, factor=0.1)
    state = sched.step(state, 1.0)   # best
    state = sched.step(state, 2.0)   # bad 1
    state = sched.step(state, 2.0)   # bad 2 > patience → scale
    assert abs(get_learning_rate(state) - 1e-4) < 1e-9
