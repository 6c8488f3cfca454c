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
from typing import Dict, Mapping, Optional, Tuple

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


def _subset_estimate(cfg: MopoeConfig, model, variables, latents, batch,
                     subset_key: str, n_imp: int, rng):
    """IWAE estimate for one subset, given shared inference outputs.

    Factorized representation (style dims > 0): style posteriors join the
    importance weights exactly like the reference (utils/likelihood.py:
    95-131, 163-211) — a modality IN the subset contributes its encoded
    style posterior; a modality outside it gets the N(0, I) 'random style
    dist' (VAEtrimodalMimic.py:109-123), whose log q and log p cancel in
    the weight while its prior style sample still drives the decode. The
    marginal for modality m includes m's style term only when m ∈ subset
    (likelihood.py:80); the joint includes every modality's. (Deviation:
    the reference's style-linearization loop reuses a leaked variable,
    likelihood.py:50-52, duplicating one modality's style across all —
    a bug we do not replicate; PARITY.md deviations table.)
    """
    members = set(subset_key.split("_"))
    mu, logvar = latents["subsets"][subset_key]
    b, d = mu.shape

    def rep(a):  # [B, ...] → [K·B, ...] with K the leading repeat
        return jnp.broadcast_to(a, (n_imp,) + a.shape).reshape(
            (n_imp * a.shape[0],) + a.shape[1:]
        )

    rng, r_c = jax.random.split(rng)
    mu_rep, lv_rep = rep(mu), rep(logvar)
    eps = jax.random.normal(r_c, mu_rep.shape, dtype=mu_rep.dtype)
    z = mu_rep + eps * jnp.exp(0.5 * lv_rep)

    # ---- style latents (factorized representation only) --------------
    style_z: Dict[str, Optional[jnp.ndarray]] = {m: None for m in cfg.modality_names}
    style_term: Dict[str, jnp.ndarray] = {}  # log p_style - log q_style
    factorized = cfg.factorized_representation and any(
        cfg.style_dims[m] for m in cfg.modality_names
    )
    if factorized:
        for m_key in cfg.modality_names:
            sd = cfg.style_dims[m_key]
            if not sd:
                continue
            if m_key in members:
                s_mu, s_lv = latents["styles"][m_key]
            else:  # random style dist = N(0, I) posterior → terms cancel
                s_mu = jnp.zeros((b, sd), dtype=mu.dtype)
                s_lv = jnp.zeros((b, sd), dtype=mu.dtype)
            rng, r_s = jax.random.split(rng)
            s_mu_r, s_lv_r = rep(s_mu), rep(s_lv)
            eps_s = jax.random.normal(r_s, s_mu_r.shape, dtype=s_mu_r.dtype)
            z_s = s_mu_r + eps_s * jnp.exp(0.5 * s_lv_r)
            style_z[m_key] = z_s
            style_term[m_key] = unit_gaussian_log_pdf(z_s) - gaussian_log_pdf(
                z_s, s_mu_r, s_lv_r
            )

    gen = model.apply(
        variables, z, style_z, False,
        method=lambda m, zc, styles, train: {
            mod: m.decoders[mod](zc, styles[mod], train=train)
            for mod in m.config.modality_names
        },
    )

    log_q = gaussian_log_pdf(z, mu_rep, lv_rep)
    log_p_z = unit_gaussian_log_pdf(z)
    content_term = log_p_z - log_q

    out: Dict[str, jnp.ndarray] = {}
    log_px_sum = 0.0
    style_term_sum = sum(style_term.values()) if style_term else 0.0
    for m_key in cfg.modality_names:
        tgt = rep(batch[m_key])
        log_px = _mod_log_prob(cfg, m_key, gen[m_key], tgt)
        log_px_sum = log_px_sum + log_px
        # marginal: style term only for the evaluated modality, and
        # only when it is part of the conditioning subset
        s_term = style_term.get(m_key, 0.0) if m_key in members else 0.0
        lw = (log_px + content_term + s_term).reshape(n_imp, b).T  # [B, K]
        out[m_key] = jnp.mean(log_mean_exp(lw, axis=1))
    lw_joint = (log_px_sum + content_term + style_term_sum).reshape(n_imp, b).T
    out["joint"] = jnp.mean(log_mean_exp(lw_joint, axis=1))
    return out


def make_likelihood_fn(cfg: MopoeConfig, model, subset_keys, n_imp: int = None):
    """ONE jitted fn(params, batch_stats, batch, rng) → {subset: {mod:
    ll, 'joint': ll}} for ALL subsets: inference runs once and its
    posteriors feed every subset's estimate (the reference computes
    latents once per batch too, likelihood.py:113-118 — a per-subset
    re-encode would be 2^M-1 redundant encoder passes and as many
    dispatches per batch)."""
    n_imp = n_imp or cfg.num_imp_samples
    keys = tuple(subset_keys)

    @jax.jit
    def estimate_all(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        latents = model.apply(
            variables, batch, train=False,
            method=lambda m, b, train: m.inference(b, train=train),
        )
        out = {}
        for s_key in keys:
            rng, r = jax.random.split(rng)
            out[s_key] = _subset_estimate(
                cfg, model, variables, latents, batch, s_key, n_imp, r
            )
        return out

    return estimate_all


def make_subset_likelihood_fn(cfg: MopoeConfig, model, subset_key: str, n_imp: int = None):
    """Single-subset convenience wrapper over make_likelihood_fn."""
    fn = make_likelihood_fn(cfg, model, (subset_key,), n_imp)

    def estimate(params, batch_stats, batch, rng):
        return fn(params, batch_stats, batch, rng)[subset_key]

    return estimate


def estimate_likelihoods(exp, state, mesh=None, max_batches: int = 0) -> Dict[str, Dict[str, float]]:
    """Per-subset IWAE estimates averaged over the test set
    (estimate_likelihoods, likelihood.py:94-129)."""
    cfg = exp.cfg
    test_loader = exp.eval_batches("test")  # device-resident when enabled
    rng = jax.random.PRNGKey((cfg.seed or 0) + 31)
    subset_keys = list(exp.subsets)
    # built ONCE per experiment — a per-round rebuild would recompile the
    # all-subsets IWAE program every eval round (experiment.cached_jit)
    fn = exp.cached_jit(
        ("likelihood", tuple(subset_keys)),
        lambda: make_likelihood_fn(cfg, exp.model, subset_keys),
    )
    sums: Dict[str, Dict[str, float]] = {
        s: {m: 0.0 for m in list(cfg.modality_names) + ["joint"]}
        for s in subset_keys
    }
    count = 0
    for i, (batch, _labels) in enumerate(test_loader):
        if max_batches and i >= max_batches:
            break
        rng, r = jax.random.split(rng)
        all_vals = jax.device_get(fn(state.params, state.batch_stats, batch, r))
        for s_key, vals in all_vals.items():
            for m_key, v in vals.items():
                sums[s_key][m_key] += float(v)
        count += 1
    if jax.process_count() > 1:
        # multi-controller: each rank summed over its host shard of the
        # test set — reduce the (sums, count) across ranks so every rank
        # reports the identical global estimate
        from mopoe_mimic_tpu.parallel.mesh import allgather_rows

        m_keys = list(cfg.modality_names) + ["joint"]
        vec = np.asarray(
            [sums[s][m] for s in subset_keys for m in m_keys] + [float(count)]
        )
        total = allgather_rows(vec[None, :]).sum(axis=0)
        it = iter(total[:-1])
        sums = {s: {m: float(next(it)) for m in m_keys} for s in subset_keys}
        count = total[-1]
    return {
        s: {m: v / max(count, 1) for m, v in d.items()} for s, d in sums.items()
    }
