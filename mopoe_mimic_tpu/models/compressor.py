"""Gaussian head: features → (mu, logvar) content + optional style heads.

Parity: LinearFeatureCompressor (mimic/networks/FeatureCompressor.py:4-28).
Returned as ``(mu_content, logvar_content)`` or
``(mu_content, logvar_content, mu_style, logvar_style)`` — the order the
reference's EncoderImg/EncoderText expose (ConvNetworksImgMimic.py:29-36).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class LinearFeatureCompressor(nn.Module):
    class_dim: int
    style_dim: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray):
        feats = feats.reshape(feats.shape[0], -1)
        dense = lambda n, name: nn.Dense(  # noqa: E731
            n, use_bias=True, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        mu_c = dense(self.class_dim, "content_mu")(feats)
        logvar_c = dense(self.class_dim, "content_logvar")(feats)
        if self.style_dim:
            mu_s = dense(self.style_dim, "style_mu")(feats)
            logvar_s = dense(self.style_dim, "style_logvar")(feats)
            return mu_c, logvar_c, mu_s, logvar_s
        return mu_c, logvar_c
