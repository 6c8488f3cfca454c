"""Pure log-prob functions replacing torch.distributions objects.

The reference wraps decoder outputs in torch.distributions instances
(mimic/modalities/utils.py:4-15 maps {'bernoulli','categorical','laplace',
'normal'} to distribution classes) and computes
``out_dist.log_prob(target).sum() / norm`` (mimic/modalities/Modality.py:25-30).
Distribution objects don't exist under jit; these are the equivalent pure
functions, numerically identical to the torch formulas.

All functions return *elementwise* log probabilities; reduction/normalization
is the caller's job (see train/losses.py), matching the reference split
between distribution objects and Modality.calc_log_prob.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
from jax import nn as jnn

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def laplace_log_prob(x: jnp.ndarray, loc: jnp.ndarray, scale) -> jnp.ndarray:
    """log Laplace(x; loc, scale) — matches torch.distributions.Laplace.

    The image decoders emit ``(mean, 0.75)`` — a fixed scale
    (mimic/networks/ConvNetworksImgMimic.py:54).
    """
    scale = jnp.asarray(scale, dtype=x.dtype)
    return -jnp.log(2.0 * scale) - jnp.abs(x - loc) / scale


def normal_log_prob(x: jnp.ndarray, loc: jnp.ndarray, scale) -> jnp.ndarray:
    scale = jnp.asarray(scale, dtype=x.dtype)
    var = scale * scale
    return -((x - loc) ** 2) / (2.0 * var) - jnp.log(scale) - _HALF_LOG_2PI


def bernoulli_log_prob(x: jnp.ndarray, probs: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """log Bernoulli(x; probs) — torch parameterizes by probs here."""
    probs = jnp.clip(probs, eps, 1.0 - eps)
    return x * jnp.log(probs) + (1.0 - x) * jnp.log1p(-probs)


def one_hot_categorical_log_prob(one_hot_target: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """log OneHotCategorical(target; logits), class axis = -1.

    torch.distributions.OneHotCategorical normalizes logits internally;
    the reference's text decoders already emit log-softmax outputs
    (char_encoding/DataGeneratorText.py:51,75) so normalization there is a
    no-op — we keep the explicit normalization for parity with arbitrary
    logits. Reduces over the class axis only (one scalar per position),
    like torch's .log_prob.
    """
    log_norm = jnn.log_softmax(logits, axis=-1)
    return jnp.sum(one_hot_target * log_norm, axis=-1)


def get_log_prob_fn(name: str) -> Callable:
    """Factory keyed by the reference's likelihood names
    (mimic/modalities/utils.py:4-15)."""
    table = {
        "laplace": laplace_log_prob,
        "normal": normal_log_prob,
        "bernoulli": bernoulli_log_prob,
        "categorical": one_hot_categorical_log_prob,
    }
    if name not in table:
        raise NotImplementedError(f"likelihood '{name}' not implemented")
    return table[name]
