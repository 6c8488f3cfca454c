"""Fused BatchNorm → ReLU → pointwise-conv: the residual blocks' first
stage as ONE Pallas kernel, without materializing the BN/ReLU activations
in HBM.

Every residual block (mimic/networks/ResidualBlocks.py:5-131; our
models/resblocks.py) opens with ``BN → ReLU → 1×1 conv``. A 1×1
(transpose-)conv with stride 1 IS a matmul over the channel axis, but XLA
lowers convs to custom calls that cannot fuse elementwise producers, so
the normalized/ReLU'd tensor is written to HBM and immediately re-read —
pure bandwidth waste on a step that executes at the v5e HBM roofline
(BENCH.md step-diet table: ms/step tracks bytes/step at ~800 GB/s). Per
block this costs two full passes of the block input forward (BN-out
write + conv read) plus the saved activation's backward re-read.

This kernel computes, per row tile resident in VMEM (rows = batch ×
spatial, flattened):

    xhat = (x - mean) * rsqrt(var + eps)         (f32)
    h    = relu(gamma * xhat + beta)             (f32, cast to compute)
    y    = h @ W (+ b)                           (MXU, f32 accumulation)

with batch statistics computed OUTSIDE the kernel by one XLA reduction
over x (exactly flax ``nn.BatchNorm``'s fast-variance f32 stats:
``var = max(0, E[x²] − E[x]²)``) — the same single read of x the unfused
stats fusion already pays.

The custom VJP implements the full train-mode BatchNorm backward (the
stats' dependence on x included) in two Pallas passes that *recompute*
xhat/h from x on the VPU/MXU instead of saving them:

  pass A (reduce):  dW = Σ hᵀ·dy, db = Σ dy, dγ = Σ dĥ·xhat, dβ = Σ dĥ
  pass B (dx):      dx = γ·inv·(dĥ − dβ/R − xhat·dγ/R)

where dĥ = (dy @ Wᵀ)·1[h>0] and Σdxhat = γ·dβ, Σdxhat·xhat = γ·dγ fold
the BN reductions into the pass-A outputs. Backward traffic is two reads
of (x, dy) plus one write of dx — vs the unfused path's conv dgrad +
wgrad + BN-stat reductions + BN dx passes over saved activations.

Numerics: normalize/ReLU run in float32 and the matmul accumulates in
float32 (``preferred_element_type``) with bf16 MXU inputs — matching the
parity path (f32 BN output, nn.Conv's bf16 cast) up to accumulation
order. Like ops/pallas_texthead.py this is an opt-in production knob
(``config.fused_pointwise``); value/grad equality vs the unfused
composition is pinned in tests/test_pallas_pointwise.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode needs no memory spaces
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except ImportError:  # pragma: no cover
    pltpu = None
    _VMEM = None

ROW_TILE = 512


def _vmem_spec(block_shape=None, index_map=None):
    kwargs = {} if _VMEM is None else {"memory_space": _VMEM}
    if block_shape is None:
        return pl.BlockSpec(**kwargs)
    return pl.BlockSpec(block_shape, index_map, **kwargs)


def _norm_relu(x, g_ref, b_ref, m_ref, inv_ref):
    """f32 normalize + affine + relu of one tile."""
    xhat = (x.astype(jnp.float32) - m_ref[:]) * inv_ref[:]
    h = jnp.maximum(g_ref[:] * xhat + b_ref[:], 0.0)
    return xhat, h


def _fwd_kernel(x_ref, g_ref, b_ref, m_ref, inv_ref, k_ref, cb_ref, y_ref):
    _, h = _norm_relu(x_ref[:], g_ref, b_ref, m_ref, inv_ref)
    y = jnp.dot(h.astype(k_ref.dtype), k_ref[:],
                preferred_element_type=jnp.float32)
    y_ref[:] = (y + cb_ref[:]).astype(y_ref.dtype)


def _bwd_reduce_kernel(x_ref, g_ref, b_ref, m_ref, inv_ref, k_ref, dy_ref,
                       dk_ref, dcb_ref, dg_ref, db_ref):
    """Pass A: recompute xhat/h, form dĥ, accumulate the four reductions.
    The outputs have constant index maps, so they stay resident in VMEM
    across the (sequential) grid and are written back to HBM once."""
    xhat, h = _norm_relu(x_ref[:], g_ref, b_ref, m_ref, inv_ref)
    dy = dy_ref[:]
    # dh = dy @ Wᵀ  (contract output channels)
    dh = jax.lax.dot_general(
        dy, k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dhr = jnp.where(h > 0, dh, 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dcb_ref[:] = jnp.zeros_like(dcb_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    # dW += hᵀ @ dy  (contract rows)
    dk_ref[:] += jax.lax.dot_general(
        h.astype(k_ref.dtype), dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dcb_ref[:] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    dg_ref[:] += jnp.sum(dhr * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dhr, axis=0, keepdims=True)


def _bwd_dx_kernel(nrows, x_ref, g_ref, b_ref, m_ref, inv_ref, k_ref,
                   dy_ref, dg_ref, db_ref, dx_ref):
    """Pass B: dx = γ·inv·(dĥ − dβ/R − xhat·dγ/R); Σdxhat = γ·dβ and
    Σdxhat·xhat = γ·dγ fold the global BN reductions into pass A's
    outputs (dxhat = γ·dĥ). ``nrows`` is the static unpadded row count."""
    xhat, h = _norm_relu(x_ref[:], g_ref, b_ref, m_ref, inv_ref)
    dh = jax.lax.dot_general(
        dy_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dhr = jnp.where(h > 0, dh, 0.0)
    dx = g_ref[:] * inv_ref[:] * (dhr - db_ref[:] / nrows - xhat * dg_ref[:] / nrows)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _row_pad(x: jnp.ndarray, tile: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % tile
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _core(x, gamma, beta, mean, var, kernel, cbias, eps, interpret):
    y, _ = _core_fwd(x, gamma, beta, mean, var, kernel, cbias, eps, interpret)
    return y


def _tile(r: int) -> int:
    """Power-of-two row tile ≤ ROW_TILE (≥16 = the bf16 sublane minimum);
    small inputs (decoder 1×1-spatial stages) get one padded tile."""
    return min(ROW_TILE, max(16, 1 << (r - 1).bit_length()))


def _core_fwd(x, gamma, beta, mean, var, kernel, cbias, eps, interpret):
    R, C = x.shape
    Co = kernel.shape[1]
    inv = jax.lax.rsqrt(var + eps)
    tile = _tile(R)
    xp = _row_pad(x, tile)
    grid = (xp.shape[0] // tile,)
    row2 = lambda a: a.reshape(1, -1).astype(jnp.float32)
    y = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            _vmem_spec((tile, C), lambda i: (i, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((C, Co), lambda i: (0, 0)),
            _vmem_spec((1, Co), lambda i: (0, 0)),
        ],
        out_specs=_vmem_spec((tile, Co), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], Co), kernel.dtype),
        interpret=interpret,
    )(xp, row2(gamma), row2(beta), row2(mean), row2(inv), kernel, row2(cbias))
    return y[:R], (x, gamma, beta, mean, inv, kernel)


def _core_bwd(eps, interpret, res, gy):
    x, gamma, beta, mean, inv, kernel = res
    R, C = x.shape
    Co = kernel.shape[1]
    tile = _tile(R)
    xp = _row_pad(x, tile)
    # padded dy rows are zero → they contribute nothing to any reduction
    # and their dx rows are sliced away
    gyp = _row_pad(gy.astype(kernel.dtype), tile)
    grid = (xp.shape[0] // tile,)
    row2 = lambda a: a.reshape(1, -1).astype(jnp.float32)
    g2, b2, m2, i2 = row2(gamma), row2(beta), row2(mean), row2(inv)

    dk, dcb, dg, db = pl.pallas_call(
        _bwd_reduce_kernel,
        grid=grid,
        in_specs=[
            _vmem_spec((tile, C), lambda i: (i, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((C, Co), lambda i: (0, 0)),
            _vmem_spec((tile, Co), lambda i: (i, 0)),
        ],
        out_specs=[
            _vmem_spec((C, Co), lambda i: (0, 0)),
            _vmem_spec((1, Co), lambda i: (0, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, Co), jnp.float32),
            jax.ShapeDtypeStruct((1, Co), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=interpret,
    )(xp, g2, b2, m2, i2, kernel, gyp)

    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, float(R)),
        grid=grid,
        in_specs=[
            _vmem_spec((tile, C), lambda i: (i, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((C, Co), lambda i: (0, 0)),
            _vmem_spec((tile, Co), lambda i: (i, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
            _vmem_spec((1, C), lambda i: (0, 0)),
        ],
        out_specs=_vmem_spec((tile, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], C), x.dtype),
        interpret=interpret,
    )(xp, g2, b2, m2, i2, kernel, gyp, dg, db)[:R]

    return (dx, dg[0].astype(gamma.dtype), db[0].astype(beta.dtype),
            jnp.zeros_like(mean), jnp.zeros_like(mean),  # see fused_bn_relu_pointwise
            dk.astype(kernel.dtype), dcb[0].astype(jnp.float32))


_core.defvjp(_core_fwd, _core_bwd)


def fused_bn_relu_pointwise(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    kernel: jnp.ndarray,
    cbias: Optional[jnp.ndarray],
    eps: float,
    compute_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Train-mode ``conv1x1(relu(batchnorm(x)))`` over the leading axes.

    Args:
      x:      [..., C] block input (f32 or bf16); leading axes flatten to rows.
      gamma:  [C] BN scale (param dtype).
      beta:   [C] BN bias.
      kernel: pointwise conv kernel — [C, Co] or flax layout
              [1, C, Co] / [1, 1, C, Co]; cast to ``compute_dtype`` here,
              matching nn.Conv/TorchConvTranspose's parameter cast.
      cbias:  [Co] conv bias or None.
      eps:    BN epsilon.
      compute_dtype: the module compute dtype (MXU input / output dtype).
      interpret: run the Pallas interpreter (CPU tests).

    Returns ``(y, mean, var)`` with y [..., Co] in the kernel's compute
    dtype and mean/var the f32 batch statistics (flax fast-variance
    semantics) for the caller's running-stats update. The VJP treats the
    statistics as *internal* to the op — their returned cotangent slots
    are zero because dx already contains the full train-mode BatchNorm
    backward (stats' dependence on x included); mean/var outputs must
    only feed non-differentiated consumers (the running-stat update).
    """
    lead = x.shape[:-1]
    C = x.shape[-1]
    kernel = kernel.reshape(C, -1)
    Co = kernel.shape[1]
    x2 = x.reshape(-1, C)

    # flax _compute_stats: f32, fast variance, clamped at zero
    xf = x2.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0)
    var = jnp.maximum(0.0, jnp.mean(jnp.square(xf), axis=0) - jnp.square(mean))

    cb = jnp.zeros((Co,), jnp.float32) if cbias is None else cbias.astype(jnp.float32)
    y = _core(x2, gamma.astype(jnp.float32), beta.astype(jnp.float32),
              jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var),
              kernel.astype(compute_dtype), cb, eps, interpret)
    return y.reshape(*lead, Co), mean, var


def reference_bn_relu_pointwise(x, gamma, beta, kernel, cbias, eps):
    """Unfused float32 reference for tests: flax-semantics train-mode BN →
    relu → pointwise matmul (stats differentiated by autodiff)."""
    C = x.shape[-1]
    kernel = kernel.reshape(C, -1).astype(jnp.float32)
    x2 = x.reshape(-1, C).astype(jnp.float32)
    mean = jnp.mean(x2, axis=0)
    var = jnp.maximum(0.0, jnp.mean(jnp.square(x2), axis=0) - jnp.square(mean))
    xhat = (x2 - mean) * jax.lax.rsqrt(var + eps)
    h = jnp.maximum(gamma.astype(jnp.float32) * xhat + beta.astype(jnp.float32), 0.0)
    y = h @ kernel
    if cbias is not None:
        y = y + cbias.astype(jnp.float32)
    return y.reshape(*x.shape[:-1], kernel.shape[1]), mean, var
