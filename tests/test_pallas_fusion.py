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


def test_pallas_fusion_tiled_batch():
    rng = np.random.default_rng(1)
    m, b, d = 2, 256, 4
    mus = jnp.asarray(rng.normal(size=(m, b, d)).astype(np.float32))
    lvs = jnp.asarray(rng.normal(size=(m, b, d)).astype(np.float32))
    mask = subset_mask_matrix(("PA", "text"))
    a_mu, _ = poe_subsets(mus, lvs, mask)
    b_mu, _ = poe_subsets_pallas(mus, lvs, mask, batch_tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(a_mu), np.asarray(b_mu), atol=1e-6)
