"""KL divergences and joint-divergence measures.

Numerical parity targets:
  * ``kl_divergence`` — mimic/evaluation/divergence_measures/kl_div.py:8-16:
    sum over *all* elements (batch and latent dims), optionally divided by a
    normalization value (the configured batch size, not the runtime batch).
  * ``group_divergence_moe`` — mm_div.py:90-110: per-component KL(q_k ‖ N(0,I))
    weighted sum.
  * ``alpha_jsd_divergence`` — mm_div.py:67-87: KL against the alpha-PoE
    dynamic prior (JSD objective).
  * ``gaussian_entropy`` — kl_div.py:114-120.

The reference loops over components; we compute all components in one
vectorized reduction (component axis kept, reduced over batch/dim).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from mopoe_mimic_tpu.ops.fusion import alpha_poe


def kl_divergence(
    mu0: jnp.ndarray,
    logvar0: jnp.ndarray,
    mu1: Optional[jnp.ndarray] = None,
    logvar1: Optional[jnp.ndarray] = None,
    norm_value: Optional[float] = None,
) -> jnp.ndarray:
    """KL(N(mu0, var0) ‖ N(mu1, var1)); standard normal target if mu1 is None.

    Scalar: summed over every element, divided by norm_value if given
    (kl_div.py:8-16 — note the reference divides by flags.batch_size, a
    static config value, so partial final batches scale differently; we
    reproduce that contract).
    """
    if mu1 is None or logvar1 is None:
        kld = -0.5 * jnp.sum(1.0 - jnp.exp(logvar0) - mu0 ** 2 + logvar0)
    else:
        var_ratio = jnp.exp(logvar0 - logvar1)
        kld = -0.5 * jnp.sum(
            1.0 - var_ratio - (mu0 - mu1) ** 2 / jnp.exp(logvar1) + logvar0 - logvar1
        )
    if norm_value is not None:
        kld = kld / float(norm_value)
    return kld


def kl_divergence_batched(
    mu0: jnp.ndarray,
    logvar0: jnp.ndarray,
    mu1: Optional[jnp.ndarray] = None,
    logvar1: Optional[jnp.ndarray] = None,
    norm_value: Optional[float] = None,
) -> jnp.ndarray:
    """KL per leading-axis component: inputs [K, B, D] → output [K].

    Vectorized replacement for the reference's component loop in
    calc_group_divergence_moe (mm_div.py:90-110).
    """
    if mu1 is None or logvar1 is None:
        kld = -0.5 * jnp.sum(
            1.0 - jnp.exp(logvar0) - mu0 ** 2 + logvar0, axis=(-2, -1)
        )
    else:
        var_ratio = jnp.exp(logvar0 - logvar1)
        kld = -0.5 * jnp.sum(
            1.0 - var_ratio - (mu0 - mu1) ** 2 / jnp.exp(logvar1) + logvar0 - logvar1,
            axis=(-2, -1),
        )
    if norm_value is not None:
        kld = kld / float(norm_value)
    return kld


def group_divergence_moe(
    mus: jnp.ndarray,
    logvars: jnp.ndarray,
    weights: jnp.ndarray,
    normalization: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-prior joint divergence: Σ_k w_k · KL(q_k ‖ N(0, I)).

    mus, logvars: [K, B, D]; weights: [K]. Returns (group_div, per-component
    klds [K]). Parity: mm_div.py:90-110 with normalization set.
    """
    klds = kl_divergence_batched(mus, logvars, norm_value=normalization)
    group_div = jnp.sum(weights.astype(klds.dtype) * klds)
    return group_div, klds


def alpha_jsd_divergence(
    mus: jnp.ndarray,
    logvars: jnp.ndarray,
    weights: jnp.ndarray,
    normalization: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Dynamic-prior (JSD) joint divergence: KL of each component against the
    alpha-PoE of all components (mm_div.py:67-87).

    Returns (group_div, klds [K], (alpha_mu, alpha_logvar)).
    """
    alpha_mu, alpha_logvar = alpha_poe(weights, mus, logvars)
    klds = kl_divergence_batched(
        mus,
        logvars,
        jnp.broadcast_to(alpha_mu, mus.shape),
        jnp.broadcast_to(alpha_logvar, logvars.shape),
        norm_value=normalization,
    )
    group_div = jnp.sum(weights.astype(klds.dtype) * klds)
    return group_div, klds, (alpha_mu, alpha_logvar)


def gaussian_entropy(logvar: jnp.ndarray, norm_value: Optional[float] = None) -> jnp.ndarray:
    """0.5 · Σ (log 2π + logvar + 1) (kl_div.py:114-120)."""
    ent = 0.5 * jnp.sum(math.log(2.0 * math.pi) + logvar + 1.0)
    if norm_value is not None:
        ent = ent / float(norm_value)
    return ent


# ---------------------------------------------------------------------------
# Gaussian-mixture KL bounds (JSD variant toolbox, kl_div.py:19-111):
# variational lower/upper bounds on KL(q_k ‖ mixture) via pairwise Gaussian
# overlap integrals.
# ---------------------------------------------------------------------------

def _gaussian_scaling_factor(mu1, logvar1, mu2=None, logvar2=None,
                             norm_value: Optional[float] = None):
    """Pairwise Gaussian product mass (kl_div.py:19-37)."""
    two_pi = 2.0 * math.pi
    d = mu1.shape[1]
    if mu2 is None or logvar2 is None:
        s_pre = (1.0 / two_pi ** (d / 2)) * jnp.sum(jnp.exp(logvar1) + 1.0, axis=1) ** 0.5
        s = s_pre * jnp.sum(jnp.exp(-0.5 * mu1 ** 2 / (jnp.exp(logvar1) + 1.0)), axis=1)
    else:
        var_sum = jnp.exp(logvar1) + jnp.exp(logvar2)
        s_pre = jnp.sum(1.0 / (two_pi ** (d / 2) * var_sum), axis=1) ** 0.5
        s = s_pre * jnp.sum(jnp.exp(-0.5 * (mu1 - mu2) ** 2 / var_sum), axis=1)
    s = jnp.sum(s)
    return s / float(norm_value) if norm_value is not None else s


def _gaussian_scaling_factor_self(logvar1, norm_value: Optional[float] = None):
    d = logvar1.shape[1]
    s = (1.0 / (2.0 * math.pi) ** (d / 2)) * jnp.sum(jnp.exp(logvar1), axis=1) ** 0.5
    s = jnp.sum(s)
    return s / float(norm_value) if norm_value is not None else s


def kl_divergence_lb_gauss_mixture(index: int, mu1, logvar1, mus, logvars,
                                   weights, norm_value: Optional[float] = None):
    """Lower bound on KL(q_index ‖ w-weighted mixture + uniform prior)
    (kl_div.py:62-78); weights[0] is the uniform-prior weight."""
    denom = weights[0] * _gaussian_scaling_factor(mu1, logvar1, norm_value=norm_value)
    for k in range(len(mus)):
        if k == index:
            denom = denom + weights[k + 1] * _gaussian_scaling_factor_self(
                logvar1, norm_value=norm_value
            )
        else:
            denom = denom + weights[k + 1] * _gaussian_scaling_factor(
                mu1, logvar1, mus[k], logvars[k], norm_value=norm_value
            )
    return -jnp.log(denom)


def kl_divergence_ub_gauss_mixture(index: int, mu1, logvar1, mus, logvars,
                                   weights, entropy,
                                   norm_value: Optional[float] = None,
                                   cap: float = 1e5):
    """Upper bound (kl_div.py:81-100)."""
    nom = _gaussian_scaling_factor_self(logvar1, norm_value=norm_value)
    kl_uniform = kl_divergence(mu1, logvar1, norm_value=norm_value)
    denom = weights[0] * jnp.minimum(jnp.exp(kl_uniform), cap)
    for k in range(len(mus)):
        if k == index:
            denom = denom + weights[k + 1]
        else:
            kl_k = kl_divergence(mu1, logvar1, mus[k], logvars[k], norm_value=norm_value)
            denom = denom + weights[k + 1] * jnp.minimum(jnp.exp(kl_k), cap)
    return jnp.log(nom) - jnp.log(denom) + entropy
