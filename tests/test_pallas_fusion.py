"""Pallas fused subset-PoE kernel equals the einsum formulation (interpret
mode on CPU; the kernel itself targets TPU VMEM)."""

import jax
import jax.numpy as jnp
import numpy as np

from mopoe_mimic_tpu.ops.fusion import poe_subsets, subset_mask_matrix
from mopoe_mimic_tpu.ops.pallas_fusion import poe_subsets_pallas


def test_pallas_fusion_matches_einsum():
    rng = np.random.default_rng(0)
    m, b, d = 3, 16, 8
    mus = jnp.asarray(rng.normal(size=(m, b, d)).astype(np.float32))
    lvs = jnp.asarray(rng.normal(size=(m, b, d)).astype(np.float32))
    mask = subset_mask_matrix(("PA", "Lateral", "text"))
    for prior in (False, True):
        a_mu, a_lv = poe_subsets(mus, lvs, mask, prior_expert=prior)
        b_mu, b_lv = poe_subsets_pallas(mus, lvs, mask, prior_expert=prior, interpret=True)
        np.testing.assert_allclose(np.asarray(a_mu), np.asarray(b_mu), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a_lv), np.asarray(b_lv), atol=1e-6)


def test_pallas_fusion_gradients_match_einsum():
    rng = np.random.default_rng(2)
    m, b, d = 3, 8, 4
    mus = jnp.asarray(rng.normal(size=(m, b, d)).astype(np.float32))
    lvs = jnp.asarray(rng.normal(size=(m, b, d)).astype(np.float32))
    mask = subset_mask_matrix(("PA", "Lateral", "text"))

    def loss_einsum(mu, lv):
        s_mu, s_lv = poe_subsets(mu, lv, mask)
        return jnp.sum(jnp.sin(s_mu) + s_lv ** 2)

    def loss_pallas(mu, lv):
        s_mu, s_lv = poe_subsets_pallas(mu, lv, mask, interpret=True)
        return jnp.sum(jnp.sin(s_mu) + s_lv ** 2)

    g1 = jax.grad(loss_einsum, argnums=(0, 1))(mus, lvs)
    g2 = jax.grad(loss_pallas, argnums=(0, 1))(mus, lvs)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-5)


def test_pallas_fusion_tiled_batch():
    rng = np.random.default_rng(1)
    m, b, d = 2, 256, 4
    mus = jnp.asarray(rng.normal(size=(m, b, d)).astype(np.float32))
    lvs = jnp.asarray(rng.normal(size=(m, b, d)).astype(np.float32))
    mask = subset_mask_matrix(("PA", "text"))
    a_mu, _ = poe_subsets(mus, lvs, mask)
    b_mu, _ = poe_subsets_pallas(mus, lvs, mask, batch_tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(a_mu), np.asarray(b_mu), atol=1e-6)
