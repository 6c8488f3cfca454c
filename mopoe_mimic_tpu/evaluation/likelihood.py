"""Importance-weighted (IWAE) log-likelihood estimation per subset.

Parity: mimic/evaluation/eval_metrics/likelihood.py:17-129 and
mimic/utils/likelihood.py:82-220 — for each subset posterior q_S, draw
``num_imp_samples`` (default 6, likelihood.py:120) latents per datapoint,
decode all modalities, and estimate

    log p(x_m)   = mean_B[ logmeanexp_K( log p(x_m|z) + log p(z) - log q_S(z|x) ) ]
    log p(x_joint) likewise with Σ_m log p(x_m|z).

TPU-first: the K importance samples ride a leading axis through one jitted
decode (batch B·K); the whole per-subset estimate is a single XLA program,
reused for all subsets via the static subset key.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.train.losses import IMG_FIXED_SCALE
from mopoe_mimic_tpu.ops.distributions import (
    laplace_log_prob,
    one_hot_categorical_log_prob,
)

LOG2PI = math.log(2.0 * math.pi)


def gaussian_log_pdf(x, mu, logvar):
    return jnp.sum(
        -0.5 * LOG2PI - logvar / 2.0 - (x - mu) ** 2 / (2.0 * jnp.exp(logvar)),
        axis=-1,
    )


def unit_gaussian_log_pdf(x):
    return jnp.sum(-0.5 * LOG2PI - x ** 2 / 2.0, axis=-1)


def log_mean_exp(x, axis):
    m = jnp.max(x, axis=axis, keepdims=True)
    return m + jnp.log(jnp.mean(jnp.exp(x - m), axis=axis, keepdims=True))


def _mod_log_prob(cfg: MopoeConfig, name: str, rec, target):
    """Elementwise modality log-prob summed per-sample → [N]."""
    if name == "text":
        if cfg.text_encoding == "word":
            # gather target-token log-prob (no [N, L, vocab] one-hot)
            log_norm = jax.nn.log_softmax(rec, axis=-1)
            lp = jnp.take_along_axis(
                log_norm, target.astype(jnp.int32)[..., None], axis=-1
            )[..., 0]
        else:
            lp = one_hot_categorical_log_prob(target, rec)
    else:
        lp = laplace_log_prob(target, rec, IMG_FIXED_SCALE)
    return jnp.sum(lp.reshape(lp.shape[0], -1), axis=1)


def make_subset_likelihood_fn(cfg: MopoeConfig, model, subset_key: str, n_imp: int = None):
    """Jitted fn(params, batch_stats, batch, rng) → {mod: ll, 'joint': ll}
    for one subset (static key)."""
    n_imp = n_imp or cfg.num_imp_samples

    @jax.jit
    def estimate(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        latents = model.apply(
            variables, batch, train=False,
            method=lambda m, b, train: m.inference(b, train=train),
        )
        mu, logvar = latents["subsets"][subset_key]
        b, d = mu.shape
        mu_rep = jnp.broadcast_to(mu, (n_imp, b, d)).reshape(n_imp * b, d)
        lv_rep = jnp.broadcast_to(logvar, (n_imp, b, d)).reshape(n_imp * b, d)
        eps = jax.random.normal(rng, mu_rep.shape, dtype=mu_rep.dtype)
        z = mu_rep + eps * jnp.exp(0.5 * lv_rep)

        gen = model.apply(
            variables, z, None, False,
            method=lambda m, zc, styles, train: {
                mod: m.decoders[mod](zc, None, train=train)
                for mod in m.config.modality_names
            },
        )

        log_q = gaussian_log_pdf(z, mu_rep, lv_rep)
        log_p_z = unit_gaussian_log_pdf(z)

        out: Dict[str, jnp.ndarray] = {}
        log_px_sum = 0.0
        for m_key in cfg.modality_names:
            target = batch[m_key]
            rep_shape = (n_imp,) + target.shape
            tgt = jnp.broadcast_to(target, rep_shape).reshape(
                (n_imp * b,) + target.shape[1:]
            )
            log_px = _mod_log_prob(cfg, m_key, gen[m_key], tgt)
            log_px_sum = log_px_sum + log_px
            lw = (log_px + log_p_z - log_q).reshape(n_imp, b).T  # [B, K]
            out[m_key] = jnp.mean(log_mean_exp(lw, axis=1))
        lw_joint = (log_px_sum + log_p_z - log_q).reshape(n_imp, b).T
        out["joint"] = jnp.mean(log_mean_exp(lw_joint, axis=1))
        return out

    return estimate


def estimate_likelihoods(exp, state, mesh=None, max_batches: int = 0) -> Dict[str, Dict[str, float]]:
    """Per-subset IWAE estimates averaged over the test set
    (estimate_likelihoods, likelihood.py:94-129)."""
    cfg = exp.cfg
    test_loader = exp.eval_batches("test")  # device-resident when enabled
    rng = jax.random.PRNGKey((cfg.seed or 0) + 31)
    fns = {
        s_key: make_subset_likelihood_fn(cfg, exp.model, s_key)
        for s_key in exp.subsets
    }
    sums: Dict[str, Dict[str, float]] = {
        s: {m: 0.0 for m in list(cfg.modality_names) + ["joint"]} for s in fns
    }
    count = 0
    for i, (batch, _labels) in enumerate(test_loader):
        if max_batches and i >= max_batches:
            break
        for s_key, fn in fns.items():
            rng, r = jax.random.split(rng)
            vals = jax.device_get(fn(state.params, state.batch_stats, batch, r))
            for m_key, v in vals.items():
                sums[s_key][m_key] += float(v)
        count += 1
    return {
        s: {m: v / max(count, 1) for m, v in d.items()} for s, d in sums.items()
    }
