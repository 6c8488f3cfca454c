"""Reparameterized Gaussian sampling (mimic/utils/utils.py:45-48)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reparameterize(rng: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """z = mu + eps * exp(logvar / 2), eps ~ N(0, 1)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
    return mu + eps * std
