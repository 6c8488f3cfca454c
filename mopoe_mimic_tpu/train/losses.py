"""Objective assembly: reconstruction log-probs, subset KLDs, and the
method-dispatched total loss.

Parity targets (all normalized by the *configured* batch size, not the
runtime batch — the reference contract, mimic/modalities/Modality.py:25-30
and kl_div.py:14-15):

  * ``calc_log_probs`` — per-modality negative log-likelihood + rec-weighted
    sum (mimic/evaluation/losses.py:6-21); word-encoded text targets are
    one-hotted first (mimic/modalities/MimicText.py:37-40).
  * ``calc_klds`` — KL(q_S ‖ N(0,I)) for every subset posterior
    (losses.py:24-31); ``calc_klds_style`` (losses.py:34-42).
  * ``calc_joint_elbo_loss`` — weighted_log_prob + β·(β_style·style_kld +
    β_content·joint_div) (losses.py:80-89), used for moe/jsd/joint_elbo.
  * ``calc_elbo`` — generic modality/joint ELBO (mimic/utils/utils.py:105-127),
    used by the PoE objective; the PoE loss itself (joint ELBO + per-modality
    unimodal ELBOs, losses.py:54-77) is assembled in train/step.py because it
    needs extra unimodal forward passes.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.ops.distributions import (
    laplace_log_prob,
    one_hot_categorical_log_prob,
)
from mopoe_mimic_tpu.ops.kl import kl_divergence

IMG_FIXED_SCALE = 0.75  # ConvNetworksImgMimic.py:54


def modality_log_prob(
    cfg: MopoeConfig, name: str, rec: jnp.ndarray, target: jnp.ndarray
) -> jnp.ndarray:
    """log p(x_m | z), summed over all elements / batch_size."""
    if name == "text":
        from mopoe_mimic_tpu.ops.pallas_texthead import (
            TextHeadInputs,
            fused_text_logprob,
        )

        if isinstance(rec, TextHeadInputs):
            # fused vocab head (cfg.fused_text_head): the [B, L, vocab]
            # logits never leave VMEM; same value as the gather branch
            # below (float32-accumulated)
            target = jnp.squeeze(target, axis=-1) if target.ndim == 3 else target
            lp = fused_text_logprob(
                rec.h, rec.kernel, rec.bias, target.astype(jnp.int32),
                interpret=jax.default_backend() == "cpu",
            )
        elif cfg.text_encoding == "word":
            # gather the target-token log-prob instead of materializing a
            # [B, L, vocab] one-hot (same OneHotCategorical value, ~59 MB
            # less HBM traffic per step at vocab 3517)
            target = jnp.squeeze(target, axis=-1) if target.ndim == 3 else target
            log_norm = jax.nn.log_softmax(rec, axis=-1)
            lp = jnp.take_along_axis(
                log_norm, target.astype(jnp.int32)[..., None], axis=-1
            )[..., 0]
        else:
            lp = one_hot_categorical_log_prob(target, rec)
    else:
        lik = cfg.likelihoods[name]
        if lik == "laplace":
            lp = laplace_log_prob(target, rec, IMG_FIXED_SCALE)
        elif lik == "normal":
            from mopoe_mimic_tpu.ops.distributions import normal_log_prob

            lp = normal_log_prob(target, rec, IMG_FIXED_SCALE)
        elif lik == "bernoulli":
            from mopoe_mimic_tpu.ops.distributions import bernoulli_log_prob

            lp = bernoulli_log_prob(target, rec)
        else:
            raise NotImplementedError(lik)
    return jnp.sum(lp) / float(cfg.batch_size)


def calc_log_probs(
    cfg: MopoeConfig,
    rec: Mapping[str, jnp.ndarray],
    batch: Mapping[str, jnp.ndarray],
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Returns ({mod: -log p}, Σ rec_weight_m · (-log p_m))."""
    log_probs: Dict[str, jnp.ndarray] = {}
    weighted = 0.0
    for m in rec:
        log_probs[m] = -modality_log_prob(cfg, m, rec[m], batch[m])
        weighted = weighted + cfg.rec_weights[m] * log_probs[m]
    return log_probs, weighted


def calc_klds(
    cfg: MopoeConfig,
    subsets: Mapping[str, Tuple[jnp.ndarray, jnp.ndarray]],
) -> Dict[str, jnp.ndarray]:
    return {
        key: kl_divergence(mu, lv, norm_value=cfg.batch_size)
        for key, (mu, lv) in subsets.items()
    }


def calc_klds_style(
    cfg: MopoeConfig,
    styles: Mapping[str, Tuple[jnp.ndarray, jnp.ndarray]],
) -> Dict[str, jnp.ndarray]:
    return {
        m: kl_divergence(mu, lv, norm_value=cfg.batch_size)
        for m, (mu, lv) in styles.items()
    }


def calc_style_kld(cfg: MopoeConfig, klds_style: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
    """Σ style_weight_m · KL_style_m (losses.py:45-51)."""
    total = 0.0
    for m, kld in klds_style.items():
        total = total + cfg.style_weights[m] * kld
    return total


def calc_joint_elbo_loss(
    cfg: MopoeConfig,
    weighted_log_prob: jnp.ndarray,
    group_divergence: jnp.ndarray,
    klds_style: Optional[Mapping[str, jnp.ndarray]] = None,
) -> jnp.ndarray:
    kld_style = (
        calc_style_kld(cfg, klds_style)
        if (cfg.factorized_representation and klds_style)
        else 0.0
    )
    kld_weighted = cfg.beta_style * kld_style + cfg.beta_content * group_divergence
    return weighted_log_prob + cfg.beta * kld_weighted


def calc_elbo(
    cfg: MopoeConfig,
    modality: str,
    recs: Mapping[str, jnp.ndarray],
    kld_content: jnp.ndarray,
    klds_style: Optional[Mapping[str, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Generic ELBO (mimic/utils/utils.py:105-127). ``recs`` holds negative
    log-probs (loss convention), 'joint' aggregates with rec/style weights."""
    if modality == "joint":
        kld_style = 0.0
        rec_err = 0.0
        for m in recs:
            if cfg.factorized_representation and klds_style:
                kld_style = kld_style + cfg.style_weights[m] * klds_style[m]
            rec_err = rec_err + cfg.rec_weights[m] * recs[m]
    else:
        kld_style = (
            cfg.style_weights[modality] * klds_style[modality]
            if (cfg.factorized_representation and klds_style)
            else 0.0
        )
        rec_err = 1.0 * recs[modality]
    div = cfg.beta_content * kld_content + cfg.beta_style * kld_style
    return rec_err + cfg.beta * div
