"""Unit tests for fusion ops — hand-computed Gaussians + torch cross-checks
against the reference formulas (re-derived here, not imported)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mopoe_mimic_tpu.ops import (
    alpha_poe,
    mixture_component_selection,
    poe,
    poe_subsets,
    subset_mask_matrix,
    subset_powerset,
)


def _torch_poe(mu, logvar, eps=1e-8):
    # formula of mimic/evaluation/divergence_measures/mm_div.py:10-18
    var = torch.exp(logvar) + eps
    T = 1.0 / var
    pd_mu = torch.sum(mu * T, dim=0) / torch.sum(T, dim=0)
    pd_var = 1.0 / torch.sum(T, dim=0)
    return pd_mu, torch.log(pd_var)


def test_poe_two_experts_hand_computed():
    # two 1-D experts: N(0, 1) and N(2, 1) → product N(1, 0.5)
    mus = jnp.array([[[0.0]], [[2.0]]])
    logvars = jnp.array([[[0.0]], [[0.0]]])
    mu, logvar = poe(mus, logvars)
    np.testing.assert_allclose(np.asarray(mu), [[1.0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.exp(logvar)), [[0.5]], atol=1e-6)


def test_poe_matches_torch_reference_formula():
    rng = np.random.default_rng(0)
    mus = rng.normal(size=(3, 8, 16)).astype(np.float32)
    logvars = rng.normal(size=(3, 8, 16)).astype(np.float32)
    mu_j, lv_j = poe(jnp.asarray(mus), jnp.asarray(logvars))
    mu_t, lv_t = _torch_poe(torch.from_numpy(mus), torch.from_numpy(logvars))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), rtol=1e-5, atol=1e-6)


def test_subset_powerset_matches_reference_order_and_keys():
    # BaseExperiment.set_subsets: powerset by size, keys sorted-joined
    subsets = subset_powerset(("PA", "Lateral", "text"))
    assert list(subsets.keys()) == [
        "PA",
        "Lateral",
        "text",
        "Lateral_PA",
        "PA_text",
        "Lateral_text",
        "Lateral_PA_text",
    ]
    assert subsets["Lateral_PA"] == (1, 0)  # sorted names → Lateral first
    assert subsets["Lateral_PA_text"] == (1, 0, 2)


def test_poe_subsets_equals_per_subset_poe():
    rng = np.random.default_rng(1)
    M, B, D = 3, 6, 4
    mus = jnp.asarray(rng.normal(size=(M, B, D)).astype(np.float32))
    logvars = jnp.asarray(rng.normal(size=(M, B, D)).astype(np.float32))
    names = ("PA", "Lateral", "text")
    mask = subset_mask_matrix(names)
    mu_all, lv_all = poe_subsets(mus, logvars, mask)
    for row, members in enumerate(subset_powerset(names).values()):
        idx = np.asarray(members)
        mu_ref, lv_ref = poe(mus[idx], logvars[idx])
        np.testing.assert_allclose(np.asarray(mu_all[row]), np.asarray(mu_ref), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lv_all[row]), np.asarray(lv_ref), rtol=1e-4, atol=1e-5)


def test_poe_subsets_prior_expert_matches_explicit_prior():
    # method='poe' prepends N(0, I) to the expert set (BaseMMVae.py:117-124)
    rng = np.random.default_rng(2)
    M, B, D = 2, 4, 3
    mus = rng.normal(size=(M, B, D)).astype(np.float32)
    logvars = rng.normal(size=(M, B, D)).astype(np.float32)
    mask = np.ones((1, M), dtype=np.float32)
    mu_a, lv_a = poe_subsets(jnp.asarray(mus), jnp.asarray(logvars), mask, prior_expert=True)
    mus_with_prior = np.concatenate([mus, np.zeros((1, B, D), np.float32)])
    lvs_with_prior = np.concatenate([logvars, np.zeros((1, B, D), np.float32)])
    mu_b, lv_b = poe(jnp.asarray(mus_with_prior), jnp.asarray(lvs_with_prior))
    np.testing.assert_allclose(np.asarray(mu_a[0]), np.asarray(mu_b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lv_a[0]), np.asarray(lv_b), rtol=1e-5, atol=1e-6)


def test_alpha_poe_uniform_weights_reduces_to_scaled_product():
    rng = np.random.default_rng(3)
    mus = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    logvars = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    alpha = jnp.array([0.5, 0.5])
    mu, logvar = alpha_poe(alpha, mus, logvars)
    # torch formula cross-check (mm_div.py:21-33)
    var = torch.exp(torch.from_numpy(np.asarray(logvars))) + 1e-8
    T = 1.0 / var
    a = torch.tensor([0.5, 0.5]).unsqueeze(-1).unsqueeze(-1)
    pd_var = 1.0 / torch.sum(a * T, dim=0)
    pd_mu = pd_var * torch.sum(a * torch.from_numpy(np.asarray(mus)) * T, dim=0)
    np.testing.assert_allclose(np.asarray(mu), pd_mu.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar), torch.log(pd_var).numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("batch,k", [(10, 2), (10, 3), (7, 3), (12, 7)])
def test_mixture_component_selection_partition(batch, k):
    # component k owns floor(B/k) rows, last absorbs remainder
    # (mimic/utils/utils.py:55-77)
    D = 3
    mus = jnp.arange(k * batch * D, dtype=jnp.float32).reshape(k, batch, D)
    logvars = mus + 1000.0
    w = [1.0 / k] * k
    mu_sel, lv_sel = mixture_component_selection(mus, logvars, w)
    assert mu_sel.shape == (batch, D)
    # expected: rows [0, floor(B/k)) from comp 0, etc.; last takes remainder
    import math

    start = 0
    expected_rows = []
    for kk in range(k):
        end = batch if kk == k - 1 else start + int(math.floor(batch / k))
        expected_rows.append(np.asarray(mus[kk, start:end, :]))
        start = end
    np.testing.assert_array_equal(np.asarray(mu_sel), np.concatenate(expected_rows))
    np.testing.assert_array_equal(np.asarray(lv_sel), np.asarray(mu_sel) + 1000.0)
