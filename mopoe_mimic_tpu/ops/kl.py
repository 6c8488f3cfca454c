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
