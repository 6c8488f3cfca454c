"""Train state: params + BN batch stats + optimizer state + step + rng.

The reference keeps optimizer state implicitly in torch Adam and never
saves it (SURVEY.md §5 — resume is unimplemented there); here the state is
one pytree so orbax can checkpoint and restore everything.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.models.mmvae import MMVae


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


def make_optimizer(cfg: MopoeConfig) -> optax.GradientTransformation:
    """Adam with the reference hyperparameters (experiment.py:171-178);
    learning rate injected as a mutable hyperparameter so the
    ReduceLROnPlateau callback can scale it from the host without
    recompiling. Optional global-norm clipping (grad_clip_norm > 0).

    ``lr_warmup_steps > 0`` multiplies the update by a linear 1/N → 1
    ramp over the first N steps (a trailing scale_by_schedule, so it
    composes with the plateau callback's lr mutation). This is the
    stability mitigation for the reference architecture's 1×1-spatial
    BatchNorm blow-up at lr 5e-4 (docs/STABILITY.md): Adam's first steps
    are ±lr sign-steps, and before the BN statistics calibrate, a full
    5e-4 nudge swings the logvar head past exp() overflow. The reference
    "handles" this with its NaN-restart supervision loop
    (main_mimic.py:100-124); warmup removes the crash instead of
    retrying it, without touching the architecture."""
    adam = optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.initial_learning_rate, b1=cfg.beta_1, b2=cfg.beta_2
    )
    parts = []
    if cfg.grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    parts.append(adam)
    if getattr(cfg, "lr_warmup_steps", 0) > 0:
        n = cfg.lr_warmup_steps

        def ramp(step):
            return jnp.minimum(1.0, (step + 1.0) / n)

        parts.append(optax.scale_by_schedule(ramp))
    return optax.chain(*parts) if len(parts) > 1 else adam


def create_train_state(
    cfg: MopoeConfig,
    rng: jax.Array,
    sample_batch: Mapping[str, jnp.ndarray],
    model: Optional[MMVae] = None,
    tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    model = model or MMVae(cfg)
    tx = tx or make_optimizer(cfg)
    rng, init_rng, drop_rng, rep_rng, state_rng = jax.random.split(rng, 5)
    # jit the whole init: one XLA program instead of hundreds of eagerly
    # dispatched op-by-op compiles (order-of-magnitude faster cold start)
    init_fn = jax.jit(lambda r, b: model.init(r, b, train=True))
    variables = init_fn(
        {"params": init_rng, "dropout": drop_rng, "reparam": rep_rng},
        sample_batch,
    )
    params = variables["params"]
    if cfg.torch_init:
        from mopoe_mimic_tpu.models.torch_init import torch_reinit

        params = torch_reinit(params, jax.random.fold_in(init_rng, 0x70C4))
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=state_rng,
    )


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def _map_inject_state(opt_state, fn):
    """Apply fn to the (unique) InjectHyperparamsState inside opt_state,
    which may be wrapped in optax.chain tuples when clipping is enabled."""
    if hasattr(opt_state, "hyperparams"):
        return fn(opt_state)
    if isinstance(opt_state, tuple):
        mapped = [_map_inject_state(s, fn) for s in opt_state]
        if hasattr(opt_state, "_fields"):  # NamedTuple (e.g. EmptyState)
            return type(opt_state)(*mapped)
        return tuple(mapped)
    return opt_state


def _find_inject_state(opt_state):
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if isinstance(opt_state, tuple):
        for s in opt_state:
            found = _find_inject_state(s)
            if found is not None:
                return found
    return None


def get_learning_rate(state: TrainState) -> float:
    return float(_find_inject_state(state.opt_state).hyperparams["learning_rate"])


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    def update(inject):
        hyper = dict(inject.hyperparams)
        hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
        return inject._replace(hyperparams=hyper)

    return state.replace(opt_state=_map_inject_state(state.opt_state, update))
