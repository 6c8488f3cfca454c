"""Fused text vocab-head kernel (ops/pallas_texthead.py) vs the unfused
conv1x1 → log_softmax → gather reference, values AND gradients, including
the padding paths (rows not a tile multiple, odd vocab/channel sizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mopoe_mimic_tpu.ops.pallas_texthead import (
    fused_text_logprob,
    reference_text_logprob,
)

INTERPRET = jax.devices()[0].platform == "cpu"


def _case(B, L, C, V, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(B, L, C)), dtype)
    kernel = jnp.asarray(rng.normal(size=(1, C, V)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(V,)) * 0.1, jnp.float32)
    targets = jnp.asarray(rng.integers(0, V, size=(B, L)), jnp.int32)
    # force boundary token ids into the batch
    targets = targets.at[0, 0].set(0).at[0, -1].set(V - 1)
    return h, kernel, bias, targets


@pytest.mark.parametrize(
    "B,L,C,V",
    [
        (4, 128, 64, 3517),  # flagship head shape (batch-reduced)
        (3, 17, 10, 37),     # nothing aligned: rows, channels, vocab all pad
        (2, 256, 128, 128),  # exactly aligned
    ],
)
def test_forward_matches_reference(B, L, C, V):
    h, kernel, bias, targets = _case(B, L, C, V)
    got = fused_text_logprob(h, kernel, bias, targets, interpret=INTERPRET)
    want = reference_text_logprob(h, kernel, bias, targets)
    assert got.shape == (B, L)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    B, L, C, V = 3, 32, 24, 301
    h, kernel, bias, targets = _case(B, L, C, V, seed=1)
    # weighted scalar so the cotangent is non-uniform across positions
    w = jnp.asarray(np.random.default_rng(2).normal(size=(B, L)), jnp.float32)

    def fused_loss(h, k, b):
        return jnp.sum(w * fused_text_logprob(h, k, b, targets, interpret=INTERPRET))

    def ref_loss(h, k, b):
        return jnp.sum(w * reference_text_logprob(h, k, b, targets))

    g_f = jax.grad(fused_loss, argnums=(0, 1, 2))(h, kernel, bias)
    g_r = jax.grad(ref_loss, argnums=(0, 1, 2))(h, kernel, bias)
    for got, want, name in zip(g_f, g_r, ("dh", "dkernel", "dbias")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


def test_bf16_inputs_close_to_f32_reference():
    B, L, C, V = 4, 128, 64, 3517
    h, kernel, bias, targets = _case(B, L, C, V, seed=3, dtype=jnp.bfloat16)
    got = fused_text_logprob(h, kernel, bias, targets, interpret=INTERPRET)
    want = reference_text_logprob(h.astype(jnp.float32), kernel, bias, targets)
    # bf16 MXU inputs, f32 accumulation: close to the f32 reference
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-2, atol=5e-2)


def test_sum_logprob_is_batch_loss_scale():
    """The value the train step consumes: sum(lp)/batch_size finite and
    negative (log-probabilities of a softmax)."""
    B, L, C, V = 2, 128, 64, 503
    h, kernel, bias, targets = _case(B, L, C, V, seed=4)
    lp = fused_text_logprob(h, kernel, bias, targets, interpret=INTERPRET)
    val = float(jnp.sum(lp) / B)
    assert np.isfinite(val) and val < 0.0


# ---------------------------------------------------------------------------
# integration: cfg.fused_text_head through the jitted train step
# ---------------------------------------------------------------------------

def _tiny_cfg(**over):
    from mopoe_mimic_tpu.config import MopoeConfig

    base = dict(
        method="joint_elbo", dataset="testing", text_encoding="word",
        img_size=64, DIM_img=4, DIM_text=4, class_dim=8, vocab_size=97,
        batch_size=4, compute_dtype="float32", use_pallas_fusion=False,
    )
    base.update(over)
    return MopoeConfig(**base)


def _state_and_batch(cfg):
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.train.state import create_train_state

    ds = SyntheticMimic(cfg, seed=0, length=cfg.batch_size)
    batch, _ = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    return state, batch


def test_fused_head_param_tree_identical():
    cfg_f = _tiny_cfg(fused_text_head=True)
    cfg_u = _tiny_cfg(fused_text_head=False)
    s_f, _ = _state_and_batch(cfg_f)
    s_u, _ = _state_and_batch(cfg_u)
    paths_f = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(s_f.params)}
    paths_u = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(s_u.params)}
    assert paths_f == paths_u  # checkpoints interchangeable


@pytest.mark.slow  # >30s on the 1-core box; excluded from the fast gate
def test_fused_head_train_step_matches_unfused():
    from mopoe_mimic_tpu.train.step import make_train_step

    cfg_u = _tiny_cfg(fused_text_head=False)
    cfg_f = _tiny_cfg(fused_text_head=True)
    state_u, batch = _state_and_batch(cfg_u)
    state_f, _ = _state_and_batch(cfg_f)
    # identical initial params (same seed/config shape)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state_u.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state_f.params)[0]),
    )
    step_u = make_train_step(cfg_u)
    step_f = make_train_step(cfg_f)
    for i in range(2):
        state_u, m_u = step_u(state_u, batch)
        state_f, m_f = step_f(state_f, batch)
        np.testing.assert_allclose(
            float(m_f["total_loss"]), float(m_u["total_loss"]),
            rtol=1e-4, err_msg=f"step {i}",
        )
        np.testing.assert_allclose(
            float(m_f["log_probs"]["text"]), float(m_u["log_probs"]["text"]),
            rtol=1e-4, err_msg=f"step {i} text log-prob",
        )
    # head params actually received gradient through the fused path
    k_init = _state_and_batch(cfg_f)[0].params["decoder_text"]["text_generator"]["conv_out"]["kernel"]
    k_after = state_f.params["decoder_text"]["text_generator"]["conv_out"]["kernel"]
    assert float(jnp.max(jnp.abs(k_after - k_init))) > 0.0


@pytest.mark.slow  # >30s on the 1-core box; excluded from the fast gate
def test_fused_head_under_scanned_epoch():
    """The production path is one lax.scan per epoch (train/scan.py);
    the fused kernel must trace/execute inside the scan body and match
    the unfused scan's loss."""
    from mopoe_mimic_tpu.data.device_store import DeviceStore
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.train.scan import epoch_index_matrix, make_train_epoch

    losses = {}
    for fused in (False, True):
        cfg = _tiny_cfg(fused_text_head=fused, scan_epochs=True)
        ds = SyntheticMimic(cfg, seed=0, length=8)
        store = DeviceStore(ds, cfg)
        state, _ = _state_and_batch(cfg)
        train_epoch = make_train_epoch(cfg, store)
        idx = epoch_index_matrix(store, epoch=0, batch_size=cfg.batch_size, seed=3)
        _, metrics = train_epoch(state, store.cols, idx)
        losses[fused] = float(metrics["total_loss"])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)


@pytest.mark.slow
def test_fused_head_poe_method():
    from mopoe_mimic_tpu.train.step import make_train_step

    cfg_u = _tiny_cfg(fused_text_head=False, method="poe")
    cfg_f = _tiny_cfg(fused_text_head=True, method="poe")
    state_u, batch = _state_and_batch(cfg_u)
    state_f, _ = _state_and_batch(cfg_f)
    _, m_u = make_train_step(cfg_u)(state_u, batch)
    _, m_f = make_train_step(cfg_f)(state_f, batch)
    np.testing.assert_allclose(
        float(m_f["total_loss"]), float(m_u["total_loss"]), rtol=1e-4
    )
