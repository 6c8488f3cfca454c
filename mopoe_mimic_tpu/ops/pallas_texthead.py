"""Fused text vocab-head: features → target log-probability, without ever
materializing the [B, L, vocab] logits in HBM.

The word-text decoder ends in a 1×1 conv to the vocabulary
(mimic/networks/word_encoding/DataGeneratorText.py:68-72) followed by
log-softmax, and the training objective only consumes the *target token's*
log-probability (mimic/modalities/MimicText.py:37-40). On the flagship
config that head moves ~2.3 GB/step of HBM traffic (logits write +
log-softmax reductions + the saved-for-backward copy; see
benchmarks/analyze_step_bytes.py) on a step that is memory-bandwidth-bound
at the v5e roofline (BENCH.md step-diet table) — i.e. the head's bytes are
~6% of step time while its FLOPs are negligible.

This kernel computes, per row tile resident in VMEM:

    logits = h @ W + b          (MXU, float32 accumulation)
    lse    = logsumexp(logits)
    lp     = logits[target] - lse

and the custom VJP *recomputes* the logits tile on the MXU in the backward
pass (saving only the [rows] ``lse`` vector as a residual), producing
``dh``, ``dW``, ``db`` with the [rows, vocab] softmax never leaving VMEM.
HBM traffic falls from ~6 × B·L·V to ~2 reads of h + 1 write of dh.

Numerics note: logits/softmax are accumulated in float32 inside the kernel
(``preferred_element_type``), which is slightly *more* precise than the
unfused bf16 path (bf16 conv output → bf16 log_softmax). Equality with a
float32 XLA reference is pinned in tests/test_pallas_texthead.py; the
fused path is opt-in via ``config.fused_text_head``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode needs no memory spaces
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except ImportError:  # pragma: no cover
    pltpu = None
    _VMEM = None

NEG_INF = -1e30  # bias padding for vocab columns; exp() underflows to 0
ROW_TILE = 256


class TextHeadInputs(NamedTuple):
    """Pytree container the train step substitutes for the text ``rec``
    entry when cfg.fused_text_head is on: pre-head features [B, L, C] plus
    the vocab-head params. NamedTuple = a registered pytree;
    ``isinstance`` dispatch happens in train/losses.modality_log_prob."""

    h: jnp.ndarray
    kernel: jnp.ndarray
    bias: jnp.ndarray


def _vmem_spec(block_shape=None, index_map=None):
    kwargs = {} if _VMEM is None else {"memory_space": _VMEM}
    if block_shape is None:
        return pl.BlockSpec(**kwargs)
    return pl.BlockSpec(block_shape, index_map, **kwargs)


def _fwd_kernel(h_ref, k_ref, b_ref, t_ref, lp_ref, lse_ref):
    """One row tile: h [TR, C] @ W [C, V] (+b) → lp, lse [TR, 1]."""
    logits = (
        jnp.dot(h_ref[:], k_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:].astype(jnp.float32)
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    tgt_logit = jnp.sum(
        jnp.where(cols == t_ref[:], logits, 0.0), axis=-1, keepdims=True
    )
    lp_ref[:] = tgt_logit - lse
    lse_ref[:] = lse


def _bwd_kernel(h_ref, k_ref, b_ref, t_ref, lse_ref, g_ref,
                dh_ref, dk_ref, db_ref):
    """Recompute the logits tile, form dlogits = (onehot − softmax)·g in
    VMEM, and stream it into the three grads. dW/db blocks have constant
    index maps, so they stay resident in VMEM across the (sequential) grid
    and are written back to HBM once."""
    logits = (
        jnp.dot(h_ref[:], k_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:].astype(jnp.float32)
    )
    p = jnp.exp(logits - lse_ref[:])  # softmax; padded cols underflow to 0
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    onehot = (cols == t_ref[:]).astype(jnp.float32)
    dlog = ((onehot - p) * g_ref[:]).astype(h_ref.dtype)

    # dh = dlog @ W^T  (contract vocab)
    dh_ref[:] = jax.lax.dot_general(
        dlog, k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dh_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    # dW += h^T @ dlog  (contract rows)
    dk_ref[:] += jax.lax.dot_general(
        h_ref[:], dlog, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_ref[:] += jnp.sum(dlog.astype(jnp.float32), axis=0, keepdims=True)


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value=0.0) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _core(h, kernel, bias, targets, interpret):
    lp, _ = _core_fwd_raw(h, kernel, bias, targets, interpret)
    return lp


def _core_fwd_raw(h, kernel, bias, targets, interpret):
    """h [R, C], kernel [C, V], bias [1, V], targets [R, 1] — all padded
    (R % ROW_TILE == 0, C/V % 128 == 0). Returns (lp [R,1] f32, lse)."""
    R, C = h.shape
    V = kernel.shape[1]
    grid = (R // ROW_TILE,)
    lp, lse = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            _vmem_spec((ROW_TILE, C), lambda i: (i, 0)),
            _vmem_spec((C, V), lambda i: (0, 0)),
            _vmem_spec((1, V), lambda i: (0, 0)),
            _vmem_spec((ROW_TILE, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            _vmem_spec((ROW_TILE, 1), lambda i: (i, 0)),
            _vmem_spec((ROW_TILE, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ],
        interpret=interpret,
    )(h, kernel, bias, targets)
    return lp, lse


def _core_fwd(h, kernel, bias, targets, interpret):
    lp, lse = _core_fwd_raw(h, kernel, bias, targets, interpret)
    return lp, (h, kernel, bias, targets, lse)


def _core_bwd(interpret, res, g):
    h, kernel, bias, targets, lse = res
    R, C = h.shape
    V = kernel.shape[1]
    grid = (R // ROW_TILE,)
    dh, dk, db = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            _vmem_spec((ROW_TILE, C), lambda i: (i, 0)),
            _vmem_spec((C, V), lambda i: (0, 0)),
            _vmem_spec((1, V), lambda i: (0, 0)),
            _vmem_spec((ROW_TILE, 1), lambda i: (i, 0)),
            _vmem_spec((ROW_TILE, 1), lambda i: (i, 0)),
            _vmem_spec((ROW_TILE, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            _vmem_spec((ROW_TILE, C), lambda i: (i, 0)),
            _vmem_spec((C, V), lambda i: (0, 0)),
            _vmem_spec((1, V), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), h.dtype),
            jax.ShapeDtypeStruct((C, V), jnp.float32),
            jax.ShapeDtypeStruct((1, V), jnp.float32),
        ],
        interpret=interpret,
    )(h, kernel, bias, targets, lse, g.astype(jnp.float32))
    return dh, dk.astype(kernel.dtype), db.astype(bias.dtype), None


_core.defvjp(_core_fwd, _core_bwd)


def fused_text_logprob(
    h: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    targets: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-position target log-probability of the word-text vocab head.

    Equals ``log_softmax(conv1x1(h))[..., target]`` — the train-step text
    log-likelihood (train/losses.modality_log_prob) — with the [B, L, V]
    logits kept in VMEM tiles.

    Args:
      h:       [B, L, C] decoder features (pre-head).
      kernel:  [1, C, V] (flax rank-1 conv kernel) or [C, V].
      bias:    [V].
      targets: [B, L] integer token ids.
      interpret: run the Pallas interpreter (CPU tests).

    Returns [B, L] float32 log-probs.
    """
    B, L, C = h.shape
    if kernel.ndim == 3:
        kernel = kernel[0]
    V = kernel.shape[1]
    # match the unfused path's compute dtype: nn.Conv casts params to the
    # module compute dtype before the contraction
    kernel = kernel.astype(h.dtype)

    h2 = _pad_to(_pad_to(h.reshape(B * L, C), 0, ROW_TILE), 1, 128)
    k2 = _pad_to(_pad_to(kernel, 0, 128), 1, 128)
    b2 = _pad_to(bias.reshape(1, V), 1, 128, value=NEG_INF)
    t2 = _pad_to(targets.reshape(B * L, 1).astype(jnp.int32), 0, ROW_TILE)

    lp = _core(h2, k2, b2, t2, interpret)
    return lp[: B * L, 0].reshape(B, L)


def reference_text_logprob(h, kernel, bias, targets):
    """Unfused reference (float32 math) for tests: conv1x1 → log_softmax →
    gather."""
    if kernel.ndim == 3:
        kernel = kernel[0]
    logits = jnp.einsum("blc,cv->blv", h.astype(jnp.float32), kernel.astype(jnp.float32))
    logits = logits + bias.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, targets.astype(jnp.int32)[..., None], axis=-1)[..., 0]
