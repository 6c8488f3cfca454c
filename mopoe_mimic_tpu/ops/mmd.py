"""WAE inverse-multiquadratics MMD (parity:
mimic/evaluation/divergence_measures/mmd.py:1-43 — present in the
reference's divergence toolbox but not referenced from the main path)."""

from __future__ import annotations

import jax.numpy as jnp


def inverse_multiquadratic_kernel(x: jnp.ndarray, y: jnp.ndarray, c: float) -> jnp.ndarray:
    """k(x, y) = c / (c + ||x - y||²), pairwise over rows."""
    d2 = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    return c / (c + d2)


def mmd_loss(z_q: jnp.ndarray, z_p: jnp.ndarray, scale: float = 2.0) -> jnp.ndarray:
    """MMD(q, p) with the IMQ kernel over standard WAE scale mixtures."""
    n = z_q.shape[0]
    dim = z_q.shape[-1]
    c_base = 2.0 * dim * scale
    mmd = 0.0
    for s in (0.1, 0.2, 0.5, 1.0, 2.0, 5.0, 10.0):
        c = c_base * s
        k_qq = inverse_multiquadratic_kernel(z_q, z_q, c)
        k_pp = inverse_multiquadratic_kernel(z_p, z_p, c)
        k_qp = inverse_multiquadratic_kernel(z_q, z_p, c)
        off_diag = 1.0 - jnp.eye(n, dtype=z_q.dtype)
        mmd = mmd + (
            jnp.sum(k_qq * off_diag) / (n * (n - 1))
            + jnp.sum(k_pp * off_diag) / (n * (n - 1))
            - 2.0 * jnp.mean(k_qp)
        )
    return mmd
