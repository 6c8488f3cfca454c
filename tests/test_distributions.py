"""Log-prob parity against torch.distributions (the reference's likelihood
layer, mimic/modalities/utils.py:4-15)."""

import jax.numpy as jnp
import numpy as np
import torch

from mopoe_mimic_tpu.ops import (
    bernoulli_log_prob,
    laplace_log_prob,
    normal_log_prob,
    one_hot_categorical_log_prob,
)
from mopoe_mimic_tpu.ops.kl import gaussian_entropy, kl_divergence, kl_divergence_batched


def test_laplace_log_prob_matches_torch_fixed_scale():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(4, 8, 8, 1)).astype(np.float32)
    loc = rng.uniform(size=(4, 8, 8, 1)).astype(np.float32)
    ours = laplace_log_prob(jnp.asarray(x), jnp.asarray(loc), 0.75)
    theirs = torch.distributions.Laplace(torch.from_numpy(loc), torch.tensor(0.75)).log_prob(
        torch.from_numpy(x)
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=2e-4)


def test_normal_log_prob_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 7)).astype(np.float32)
    loc = rng.normal(size=(5, 7)).astype(np.float32)
    ours = normal_log_prob(jnp.asarray(x), jnp.asarray(loc), 1.3)
    theirs = torch.distributions.Normal(torch.from_numpy(loc), torch.tensor(1.3)).log_prob(
        torch.from_numpy(x)
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=2e-4)


def test_bernoulli_log_prob_matches_torch():
    rng = np.random.default_rng(2)
    p = rng.uniform(0.05, 0.95, size=(6, 10)).astype(np.float32)
    x = (rng.uniform(size=(6, 10)) > 0.5).astype(np.float32)
    ours = bernoulli_log_prob(jnp.asarray(x), jnp.asarray(p))
    theirs = torch.distributions.Bernoulli(probs=torch.from_numpy(p)).log_prob(
        torch.from_numpy(x)
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=2e-4)


def test_one_hot_categorical_matches_torch_with_presoftmaxed_logits():
    # the text decoder emits log-softmax logits
    # (char_encoding/DataGeneratorText.py:51,75)
    rng = np.random.default_rng(3)
    raw = rng.normal(size=(4, 16, 9)).astype(np.float32)
    log_probs = np.asarray(jnp.log(jnp.exp(raw) / jnp.exp(raw).sum(-1, keepdims=True)))
    idx = rng.integers(0, 9, size=(4, 16))
    onehot = np.eye(9, dtype=np.float32)[idx]
    ours = one_hot_categorical_log_prob(jnp.asarray(onehot), jnp.asarray(log_probs))
    theirs = torch.distributions.OneHotCategorical(
        logits=torch.from_numpy(log_probs)
    ).log_prob(torch.from_numpy(onehot))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=2e-4)


def test_kl_divergence_matches_reference_formula():
    rng = np.random.default_rng(4)
    mu0 = rng.normal(size=(8, 5)).astype(np.float32)
    lv0 = rng.normal(size=(8, 5)).astype(np.float32)
    mu1 = rng.normal(size=(8, 5)).astype(np.float32)
    lv1 = rng.normal(size=(8, 5)).astype(np.float32)

    # standard-normal target (kl_div.py:10)
    t0 = -0.5 * np.sum(1 - np.exp(lv0) - mu0 ** 2 + lv0)
    ours0 = kl_divergence(jnp.asarray(mu0), jnp.asarray(lv0), norm_value=16)
    np.testing.assert_allclose(float(ours0), t0 / 16.0, rtol=1e-5)

    # general target (kl_div.py:12-13)
    t1 = -0.5 * np.sum(
        1 - np.exp(lv0) / np.exp(lv1) - (mu0 - mu1) ** 2 / np.exp(lv1) + lv0 - lv1
    )
    ours1 = kl_divergence(jnp.asarray(mu0), jnp.asarray(lv0), jnp.asarray(mu1), jnp.asarray(lv1))
    np.testing.assert_allclose(float(ours1), t1, rtol=1e-5)

    # batched variant agrees with per-component scalar
    mus = np.stack([mu0, mu1])
    lvs = np.stack([lv0, lv1])
    batched = kl_divergence_batched(jnp.asarray(mus), jnp.asarray(lvs), norm_value=4)
    for k in range(2):
        single = kl_divergence(jnp.asarray(mus[k]), jnp.asarray(lvs[k]), norm_value=4)
        np.testing.assert_allclose(float(batched[k]), float(single), rtol=1e-5)


def test_gaussian_entropy_matches_reference_formula():
    rng = np.random.default_rng(5)
    lv = rng.normal(size=(8, 5)).astype(np.float32)
    expected = 0.5 * np.sum(np.log(2 * np.pi) + lv + 1)
    ours = gaussian_entropy(jnp.asarray(lv), norm_value=8)
    np.testing.assert_allclose(float(ours), expected / 8.0, rtol=1e-5)
