"""The jitted train/eval steps.

This replaces the reference's per-batch Python orchestration
(mimic/run_epochs.py:52-142: forward → NaN check → log-probs → KLDs →
method-dispatched loss → backward → Adam step, with `.item()` host syncs
every batch) with ONE pure function compiled once per (config, presence
pattern): forward, objective, gradients, optimizer update, and on-device
metric reduction all fuse into a single XLA program. Metrics stay on
device as scalars; the host reads them asynchronously (no per-step sync).

Method dispatch:
  * moe / jsd / joint_elbo → calc_joint_elbo_loss (losses.py:80-89)
  * poe → joint ELBO + per-modality unimodal ELBOs, each of which is an
    extra unimodal forward through the same parameters
    (losses.py:54-77). The unimodal passes run inside the same jitted
    step, so the whole PoE objective is still one XLA program.

NaN guard: the reference checks latents on the host each batch and raises
NaNInLatent (mimic/utils/utils.py:201-208). Here the step emits an
on-device ``nan_in_latents`` flag folded into the metrics; the training
loop raises after the (async) read — same restart policy, no sync point.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mopoe_mimic_tpu.config import Method, MopoeConfig
from mopoe_mimic_tpu.models.mmvae import MMVae
from mopoe_mimic_tpu.train.losses import (
    calc_elbo,
    calc_joint_elbo_loss,
    calc_klds,
    calc_klds_style,
    calc_log_probs,
    modality_log_prob,
)
from mopoe_mimic_tpu.train.state import TrainState


def _use_fused_text_head(cfg: MopoeConfig, batch) -> bool:
    """cfg.fused_text_head applies only to the word/128/softmax head the
    kernel implements (ops/pallas_texthead.py) and only when text is
    present in the batch's (static) modality pattern."""
    return (
        cfg.fused_text_head
        and "text" in batch
        and cfg.text_encoding == "word"
        and cfg.len_sequence == 128
        and cfg.text_gen_lastlayer == "softmax"
    )


def _wrap_text_head(outs, params):
    """Replace the text rec (pre-head features under text_prehead=True)
    with the TextHeadInputs container carrying the vocab-head params, so
    losses.modality_log_prob can run the fused kernel. Grads flow to the
    head params through the container."""
    from mopoe_mimic_tpu.ops.pallas_texthead import TextHeadInputs

    head = params["decoder_text"]["text_generator"]["conv_out"]
    outs["rec"]["text"] = TextHeadInputs(
        outs["rec"]["text"], head["kernel"], head["bias"]
    )
    return outs


def _forward_and_objective(
    cfg: MopoeConfig,
    model: MMVae,
    params,
    batch_stats,
    batch: Mapping[str, jnp.ndarray],
    rngs: Dict[str, jax.Array],
    train: bool,
):
    """Shared by train and eval: forward + total loss + metrics."""
    # uint8-transferred modalities (cfg.transfer_uint8) dequantize on
    # device; the division fuses into the first conv's input epilogue
    batch = {
        k: (v.astype(jnp.float32) / 255.0 if v.dtype == jnp.uint8 else v)
        for k, v in batch.items()
    }
    fused_text = _use_fused_text_head(cfg, batch)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        outs, mut = model.apply(
            variables, batch, train=True, rngs=rngs, mutable=["batch_stats"],
            text_prehead=fused_text,
        )
        new_batch_stats = mut["batch_stats"]
    else:
        outs = model.apply(
            variables, batch, train=False, rngs=rngs, text_prehead=fused_text
        )
        new_batch_stats = batch_stats
    if fused_text:
        outs = _wrap_text_head(outs, params)

    log_probs, weighted_lp = calc_log_probs(cfg, outs["rec"], batch)
    klds = calc_klds(cfg, outs["latents"]["subsets"])
    klds_style = (
        calc_klds_style(cfg, outs["latents"]["styles"])
        if cfg.factorized_representation
        else None
    )
    group_div = outs["joint_divergence"]

    if cfg.method_enum is Method.POE:
        # per-modality unimodal ELBOs (losses.py:54-77). Note: like the
        # reference, each is a *full* forward with a single-modality
        # batch, and — reference parity — each unimodal forward ADVANCES
        # the BN running statistics in call order (mm_vae({m}) is a
        # train-mode torch call there): joint, then each modality. The
        # stats are threaded through sequentially; train-mode LOSSES are
        # unaffected (normalization uses batch stats), but eval-mode
        # outputs depend on the accumulated running stats.
        elbos = {}
        for m in batch:
            fused_m = fused_text and m == "text"
            outs_m = model.apply(
                {"params": params, "batch_stats": new_batch_stats},
                {m: batch[m]}, train=train, rngs=rngs,
                mutable=["batch_stats"] if train else False,
                text_prehead=fused_m,
            )
            if train:
                outs_m, mut_m = outs_m
                new_batch_stats = mut_m["batch_stats"]
            if fused_m:
                outs_m = _wrap_text_head(outs_m, params)
            rec_m = -modality_log_prob(cfg, m, outs_m["rec"][m], batch[m])
            elbos[m] = calc_elbo(cfg, m, {m: rec_m}, klds[m], klds_style)
        elbos["joint"] = calc_elbo(cfg, "joint", log_probs, group_div, klds_style)
        total_loss = sum(elbos.values())
    else:
        total_loss = calc_joint_elbo_loss(cfg, weighted_lp, group_div, klds_style)

    # on-device NaN guard over unimodal posteriors (utils.py:201-208)
    nan_flags = [
        jnp.any(jnp.isnan(t))
        for mu_lv in outs["latents"]["modalities"].values()
        for t in mu_lv
    ]
    nan_in_latents = jnp.any(jnp.stack(nan_flags))

    # latent statistics per modality (AverageMeterLatents parity,
    # mimic/utils/average_meters.py:82-93)
    latent_stats = {
        m: (jnp.mean(mu), jnp.mean(lv))
        for m, (mu, lv) in outs["latents"]["modalities"].items()
    }

    metrics = {
        "total_loss": total_loss,
        "joint_divergence": group_div,
        "klds": klds,
        "log_probs": log_probs,
        "weighted_log_prob": weighted_lp,
        "latents": latent_stats,
        "nan_in_latents": nan_in_latents,
    }
    if klds_style is not None:
        metrics["klds_style"] = klds_style
    return total_loss, new_batch_stats, metrics


def make_train_step_body(
    cfg: MopoeConfig,
    model: Optional[MMVae] = None,
    tx: Optional[optax.GradientTransformation] = None,
) -> Callable[[TrainState, Mapping[str, jnp.ndarray]], Tuple[TrainState, Dict[str, Any]]]:
    """The PURE train step (unjitted) — jitted standalone by
    make_train_step, or inlined into a multi-step ``lax.scan`` epoch
    program (train/scan.py) where per-step dispatch latency matters."""
    from mopoe_mimic_tpu.train.state import make_optimizer

    model = model or MMVae(cfg)
    tx = tx or make_optimizer(cfg)

    def train_step(state: TrainState, batch):
        new_rng, drop_rng, rep_rng = jax.random.split(state.rng, 3)
        rngs = {"dropout": drop_rng, "reparam": rep_rng}

        def loss_fn(params):
            total, new_bs, metrics = _forward_and_objective(
                cfg, model, params, state.batch_stats, batch, rngs, train=True
            )
            return total, (new_bs, metrics)

        (_, (new_bs, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            step=state.step + 1,
            rng=new_rng,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_train_step(
    cfg: MopoeConfig,
    model: Optional[MMVae] = None,
    tx: Optional[optax.GradientTransformation] = None,
) -> Callable[[TrainState, Mapping[str, jnp.ndarray]], Tuple[TrainState, Dict[str, Any]]]:
    """Build the jitted SPMD train step.

    Sharding: the caller places ``state`` replicated and ``batch`` sharded
    along the mesh data axis; under jit the XLA partitioner inserts the
    gradient all-reduce over ICI automatically (the TPU-native equivalent
    of DDP's backward hook, SURVEY.md §2.7).
    """
    donate = (0,) if cfg.donate_state else ()
    return jax.jit(make_train_step_body(cfg, model, tx), donate_argnums=donate)


def make_eval_step_body(
    cfg: MopoeConfig, model: Optional[MMVae] = None
) -> Callable[[TrainState, Mapping[str, jnp.ndarray], jax.Array], Dict[str, Any]]:
    """The PURE test-pass step (run_epochs.test :148-175): forward in eval
    mode (BN running stats, no dropout), objective only."""
    model = model or MMVae(cfg)

    def eval_step(state: TrainState, batch, rng: jax.Array):
        drop_rng, rep_rng = jax.random.split(rng)
        rngs = {"dropout": drop_rng, "reparam": rep_rng}
        _, _, metrics = _forward_and_objective(
            cfg, model, state.params, state.batch_stats, batch, rngs, train=False
        )
        return metrics

    return eval_step


def make_eval_step(
    cfg: MopoeConfig, model: Optional[MMVae] = None
) -> Callable[[TrainState, Mapping[str, jnp.ndarray], jax.Array], Dict[str, Any]]:
    """Jitted test-pass step."""
    return jax.jit(make_eval_step_body(cfg, model))
