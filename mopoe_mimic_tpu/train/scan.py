"""Whole-epoch training as ONE jitted program: ``lax.scan`` over steps
with the batch gathered from the HBM-resident DeviceStore inside the scan
body.

Motivation: the per-step path dispatches one XLA program per batch
(~30-45 ms RPC each over a thin host↔device link) and keeps the host in
the loop for the whole epoch; the scan collapses an epoch to one dispatch
and frees the (single-core) host for checkpoint writes, eval prep, and
logging. Device time is identical — the flagship step is
memory-bandwidth-bound at 41 ms either way (BENCH.md round-3 honest-clock
correction) and per-step dispatches pipeline behind execution — so the
scan's win is host-side, plus immunity to host stalls. The reference
cannot express this at all — its train loop is Python-per-batch by
construction (mimic/run_epochs.py:52-142).
With the dataset resident in HBM (data/device_store.py) the entire epoch
is data-independent control flow, so it compiles to a single ``lax.scan``
whose carry is the train state: one dispatch and ONE host read per epoch
(the per-step metric pytrees are stacked on device and averaged there).

The store columns and the index matrix travel as jit ARGUMENTS — baking
either in as HLO constants would blow the remote-compile body limit at
real sizes (see evaluation/clf_loader.py) and force a recompile per epoch
(the index matrix changes every epoch).

Numerics match the per-step path exactly: the same step body is inlined
(train/step.py ``make_train_step_body``), the same epoch order is drawn
(DeviceStore.epoch_order), and the eval pass threads the SAME rng-split
chain through the scan carry that the Python loop uses.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.models.mmvae import MMVae
from mopoe_mimic_tpu.train.state import TrainState
from mopoe_mimic_tpu.train.step import make_eval_step_body, make_train_step_body


def _mean_over_steps(metrics: Any) -> Any:
    """Per-step stacked metric pytree → on-device epoch means (bool flags
    like nan_in_latents become rates)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.mean(x.astype(jnp.float32), axis=0), metrics
    )


def _batch_constraint(store) -> Optional[Callable]:
    if store.mesh is None:
        return None
    from mopoe_mimic_tpu.parallel.mesh import batch_sharding

    sh = batch_sharding(store.mesh)

    def constrain(batch):
        return {k: jax.lax.with_sharding_constraint(v, sh) for k, v in batch.items()}

    return constrain


def make_train_epoch(
    cfg: MopoeConfig,
    store,
    model: Optional[MMVae] = None,
    tx: Optional[optax.GradientTransformation] = None,
) -> Callable[[TrainState, Dict[str, jax.Array], jax.Array], Tuple[TrainState, Any]]:
    """(state, store.cols, idx_mat [n_steps, B]) → (state, epoch-mean
    metrics). Compiled once per distinct n_steps."""
    body = make_train_step_body(cfg, model, tx)
    gather = store.gather_fn
    constrain = _batch_constraint(store)

    def epoch_fn(state, cols, idx_mat):
        def step(state, idx):
            batch = gather(cols, idx)
            if constrain is not None:
                batch = constrain(batch)
            return body(state, batch)

        state, metrics = jax.lax.scan(step, state, idx_mat)
        return state, _mean_over_steps(metrics)

    donate = (0,) if cfg.donate_state else ()
    return jax.jit(epoch_fn, donate_argnums=donate)


def make_eval_epoch(
    cfg: MopoeConfig, store, model: Optional[MMVae] = None
) -> Callable[[TrainState, jax.Array, Dict[str, jax.Array], jax.Array], Tuple[jax.Array, Any]]:
    """(state, rng, store.cols, idx_mat) → (next rng, epoch-mean metrics).
    The rng chain is identical to the Python loop's per-batch
    ``rng, r = split(rng)`` sequence, carried through the scan."""
    body = make_eval_step_body(cfg, model)
    gather = store.gather_fn
    constrain = _batch_constraint(store)

    def epoch_fn(state, rng, cols, idx_mat):
        def step(rng, idx):
            rng, r = jax.random.split(rng)
            batch = gather(cols, idx)
            if constrain is not None:
                batch = constrain(batch)
            return rng, body(state, batch, r)

        rng, metrics = jax.lax.scan(step, rng, idx_mat)
        return rng, _mean_over_steps(metrics)

    return jax.jit(epoch_fn)


def epoch_index_matrix(
    store, epoch: int, batch_size: int, seed: int = 0,
    weighted: bool = False, steps_cap: Optional[int] = None,
) -> np.ndarray:
    """[n_steps, B] int32 epoch order — the same draw iter_epoch makes
    (drop_last, identical rng stream), optionally capped like the loop's
    steps_per_training_epoch."""
    order = store.epoch_order(epoch, seed=seed, weighted=weighted)
    nb = len(order) // batch_size
    if nb == 0 and len(order) > 0:
        # split smaller than one batch (tiny smoke runs): one
        # wraparound-padded batch instead of a zero-step epoch — jit
        # needs the static batch shape, so short rows repeat.
        return np.resize(order, batch_size).reshape(1, batch_size).astype(np.int32)
    if steps_cap:
        nb = min(nb, steps_cap)
    return order[: nb * batch_size].reshape(nb, batch_size).astype(np.int32)
