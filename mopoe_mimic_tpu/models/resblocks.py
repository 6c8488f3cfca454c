"""Pre-activation residual conv blocks (1-D and 2-D, conv and transpose).

Capability parity with mimic/networks/ResidualBlocks.py: each block is
BN → ReLU → 1×1 conv → dropout(0.5) → BN → ReLU → k×k (transpose-)conv →
dropout(0.5), combined with a weighted skip ``a · shortcut(x) + b · out``;
the shortcut is a learned (transpose-)conv + BN projection whenever the
factory conditions at the reference call sites fire
(FeatureExtractorImg.py:7-21, DataGeneratorImg.py:7-27,
char_encoding/FeatureExtractorText.py:6-20, word_encoding/DataGeneratorText.py:6-27).

TPU-first choices:
  * NHWC / NLC layouts (channel-last — XLA's native TPU conv layout);
    a single block class covers 1-D and 2-D (spatial rank inferred).
  * torch's ConvTranspose semantics are reproduced with
    ``lax.conv_general_dilated`` (input dilation = stride, padding
    ``k-1-p`` per side, +output_padding on the high side) so output
    shapes match the reference exactly.
  * 2-D dropout is channelwise (torch nn.Dropout2d zeroes whole feature
    maps); 1-D blocks use elementwise dropout (the reference's 1-D blocks
    use plain nn.Dropout).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name

from mopoe_mimic_tpu.ops.pallas_pointwise import fused_bn_relu_pointwise


class TorchConvTranspose(nn.Module):
    """Transposed convolution with torch ConvTranspose{1,2}d shape semantics.

    out_spatial = (in - 1) * stride - 2 * padding + kernel + output_padding
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spatial = x.ndim - 2  # N ... C
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        kernel_shape = (k,) * spatial + (x.shape[-1], self.features)
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), kernel_shape, self.param_dtype
        )
        pad = [(k - 1 - p, k - 1 - p + op)] * spatial
        dn = lax.conv_dimension_numbers(
            x.shape,
            kernel_shape,
            ("NHWC", "HWIO", "NHWC") if spatial == 2 else ("NHC", "HIO", "NHC"),
        )
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1,) * spatial,
            padding=pad,
            lhs_dilation=(s,) * spatial,
            rhs_dilation=(1,) * spatial,
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


def _conv(features, k, s, p, use_bias, dtype, param_dtype, name=None, rank=2):
    # flax infers the spatial rank from kernel_size, so it must be a tuple
    # of the right length (an int would silently make a 1-D conv).
    return nn.Conv(
        features=features,
        kernel_size=(k,) * rank,
        strides=(s,) * rank,
        padding=[(p, p)] * rank,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=param_dtype,
        kernel_init=nn.initializers.he_normal(),
        name=name,
    )


class _BNVars(nn.Module):
    """Raw BatchNorm parameters/variables with ``nn.BatchNorm``'s exact
    tree (params: scale/bias in param_dtype; batch_stats: mean/var in
    float32) so the fused head (cfg.fused_pointwise) keeps checkpoint and
    torch-importer compatibility with the unfused ``bn1`` module."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        f = (self.features,)
        scale = self.param("scale", nn.initializers.ones, f, self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, f, self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), f)
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), f)
        return scale, bias, ra_mean, ra_var


class _ConvVars(nn.Module):
    """Raw pointwise-conv parameters with ``nn.Conv``/``TorchConvTranspose``'s
    exact tree (kernel (1,)*spatial + (Cin, Cout) he_normal; optional zeros
    bias) for the fused head."""

    features: int
    spatial: int
    use_bias: bool
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        shape = (1,) * self.spatial + (self.features, self.features)
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), shape, self.param_dtype)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        return kernel, bias


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch running-stat semantics.

    flax ``nn.BatchNorm`` stores the BIASED batch variance in its running
    stats; torch stores the UNBIASED one (Bessel ``n/(n-1)`` correction in
    ``torch.nn.modules.batchnorm._BatchNorm``). Train-mode normalization
    uses the biased variance in both frameworks, so the difference shows
    only at eval time — but it is material wherever few elements are
    normalized: the encoder-tail blocks at 1×1 spatial have n = batch
    (n=8 → +14% running var under flax semantics). Torch parity here is
    what makes eval-mode loss trajectories pin against the executed
    reference after REAL training steps (test_golden_training_trajectory),
    not just on imported frozen stats.

    Drop-in for the ``nn.BatchNorm`` usage in this package: same
    constructor kwargs subset, same variable tree (params: scale/bias in
    param_dtype; batch_stats: mean/var in float32), so checkpoints and
    the torch importer are unaffected.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (feat,))
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (feat,))
        scale = self.param("scale", nn.initializers.ones, (feat,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (feat,), self.param_dtype)
        out_dtype = self.dtype or jnp.float32
        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            # stats in float32 over all non-feature axes, fast variance
            # (E[x²]−μ², clamped at zero — flax _compute_stats form). The
            # fast form reads x ONCE and fuses into the normalize pass;
            # the two-pass E[(x−μ)²] alternative was measured at −11%
            # step throughput on the bandwidth-bound flagship (BENCH.md)
            # while the golden trajectory pins at ~1e-6 either way — the
            # f32 cancellation error is far below the cross-framework
            # tolerance at these activation scales.
            xf = x.astype(jnp.float32).reshape(-1, feat)
            mean = jnp.mean(xf, axis=0)
            var = jnp.maximum(
                0.0, jnp.mean(jnp.square(xf), axis=0) - jnp.square(mean))
            if not self.is_initializing():
                n = xf.shape[0]
                bessel = n / max(n - 1, 1)  # torch: running var is unbiased
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * (var * bessel)
        inv = lax.rsqrt(var.astype(out_dtype) + jnp.asarray(self.epsilon, out_dtype))
        y = (x.astype(out_dtype) - mean.astype(out_dtype)) * (
            inv * scale.astype(out_dtype)
        ) + bias.astype(out_dtype)
        return y


class _BlockBase(nn.Module):
    """Shared body of the residual blocks."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    a: float = 2.0
    b: float = 0.3
    dropout_rate: float = 0.5
    channelwise_dropout: bool = False  # torch Dropout2d semantics
    use_conv_bias: bool = True  # 2-D reference blocks use bias=False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # torch default 1e-5 = reference parity. The encoders end in BN at 1×1
    # spatial whose batch variance can collapse toward eps on unstructured
    # inputs (docs/STABILITY.md); cfg.bn_eps raises this floor as an
    # opt-in stability mode without touching the architecture.
    bn_eps: float = 1e-5
    # dtype of the BN normalize/affine math and output (cfg.bn_compute_dtype).
    # None = float32 (reference-precision parity). Batch statistics are
    # promoted to float32 inside flax regardless, so bf16 here only thins
    # the activation traffic, not the stat accumulation.
    bn_dtype: Optional[jnp.dtype] = None
    # cfg.fused_pointwise: compute the block's opening BN → ReLU → 1×1 conv
    # as one Pallas kernel (ops/pallas_pointwise.py) in train mode, removing
    # the materialized BN/ReLU activations from HBM traffic. Same param
    # tree; f32 normalize + f32 matmul accumulation (≈ parity numerics,
    # not bitwise — opt-in like cfg.fused_text_head).
    fused_pointwise: bool = False
    # cfg.rng_recompute_dropout: dropout masks recomputed from the
    # PRNG key in the backward pass (ops/rng_dropout.py) instead of
    # saved as residuals — bit-identical sampling, fewer bytes
    rng_recompute_dropout: bool = False

    def _bn(self, name: str) -> "TorchBatchNorm":
        # torch BatchNorm defaults: eps=1e-5, running-stat momentum 0.1
        # (flax momentum = 1 - torch momentum). Stats in float32, running
        # var unbiased (TorchBatchNorm — torch parity, not flax).
        return TorchBatchNorm(
            use_running_average=None,
            momentum=0.9,
            epsilon=self.bn_eps,
            dtype=self.bn_dtype or jnp.float32,
            param_dtype=self.param_dtype,
            name=name,
        )

    def _dropout(self, x, deterministic, spatial_rank):
        if self.dropout_rate <= 0.0:
            return x
        if deterministic:
            return x
        broadcast = tuple(range(1, 1 + spatial_rank)) if self.channelwise_dropout else ()
        # the key is drawn HERE (block level) on both paths so the flax
        # module and the rng-recompute op consume the SAME key and produce
        # bit-identical masks (flax Dropout uses the same
        # bernoulli(keep)+select formula; tests/test_rng_dropout.py pins it)
        rng = self.make_rng("dropout")
        if self.rng_recompute_dropout:
            from mopoe_mimic_tpu.ops.rng_dropout import rng_dropout

            return rng_dropout(x, rng, self.dropout_rate, broadcast)
        return nn.Dropout(
            rate=self.dropout_rate, broadcast_dims=broadcast
        )(x, deterministic=False, rng=rng)

    def _fused_head(self, x, det, spatial):
        """bn1 → relu → conv1 via the fused Pallas op (train) or the
        running-stats composition (eval — not byte-critical, and the fused
        op's batch statistics don't apply)."""
        feat = x.shape[-1]
        scale, bias, ra_mean, ra_var = _BNVars(
            feat, self.param_dtype, name="bn1")()
        kernel, cbias = _ConvVars(
            feat, spatial, self.use_conv_bias, self.param_dtype, name="conv1")()
        if det:
            # flax _normalize semantics with running stats, then the
            # pointwise conv in the compute dtype (nn.Conv's casts)
            inv = lax.rsqrt(ra_var.value + self.bn_eps)
            h = (x - ra_mean.value) * (inv * scale) + bias
            h = nn.relu(h.astype(self.bn_dtype or jnp.float32))
            y = jnp.tensordot(
                h.astype(self.dtype),
                kernel.reshape(feat, feat).astype(self.dtype),
                axes=([x.ndim - 1], [0]),
            )
            if cbias is not None:
                y = y + cbias.astype(self.dtype)
            return y
        y, mean, var = fused_bn_relu_pointwise(
            x, scale, bias, kernel, cbias, self.bn_eps,
            compute_dtype=self.dtype,
            interpret=jax.default_backend() == "cpu",
        )
        if not self.is_initializing():
            # torch running-stat update, momentum 0.9; running var is
            # unbiased (Bessel) like TorchBatchNorm, over the n = B·spatial
            # elements the kernel reduced
            n = x.size // feat
            bessel = n / max(n - 1, 1)
            ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
            ra_var.value = 0.9 * ra_var.value + 0.1 * (var * bessel)
        return y


class ResidualBlockConv(_BlockBase):
    """Downsampling residual block (ResidualBlock{1d,2d}Conv)."""

    use_shortcut: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # `train` is positional-or-keyword so nn.remat can mark it static
        # (maybe_remat below); it selects the BN branch and must stay a
        # Python bool under tracing.
        spatial = x.ndim - 2
        det = not train
        if self.fused_pointwise:
            h = self._fused_head(x, det, spatial)
        else:
            h = self._bn("bn1")(x, use_running_average=det)
            h = nn.relu(h)
            h = _conv(x.shape[-1], 1, 1, 0, self.use_conv_bias, self.dtype, self.param_dtype, "conv1", spatial)(h)
        h = checkpoint_name(h, "conv_out")
        h = self._dropout(h, det, spatial)
        h = self._bn("bn2")(h, use_running_average=det)
        h = nn.relu(h)
        h = _conv(
            self.features, self.kernel_size, self.stride, self.padding,
            self.use_conv_bias, self.dtype, self.param_dtype, "conv2", spatial,
        )(h)
        h = checkpoint_name(h, "conv_out")
        h = self._dropout(h, det, spatial)
        residual = x
        if self.use_shortcut:
            residual = _conv(
                self.features, self.kernel_size, self.stride, self.padding,
                True, self.dtype, self.param_dtype, "shortcut_conv", spatial,
            )(x)
            residual = checkpoint_name(residual, "conv_out")
            residual = self._bn("shortcut_bn")(residual, use_running_average=det)
        return self.a * residual + self.b * h


class ResidualBlockTransposeConv(_BlockBase):
    """Upsampling residual block (ResidualBlock{1d,2d}TransposeConv)."""

    output_padding: int = 0
    use_shortcut: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        spatial = x.ndim - 2
        det = not train
        if self.fused_pointwise:
            # a k1/s1/p0 transpose conv IS the same pointwise matmul
            h = self._fused_head(x, det, spatial)
        else:
            h = self._bn("bn1")(x, use_running_average=det)
            h = nn.relu(h)
            h = TorchConvTranspose(
                x.shape[-1], 1, 1, 0, 0, self.use_conv_bias, self.dtype, self.param_dtype,
                name="conv1",
            )(h)
        h = checkpoint_name(h, "conv_out")
        h = self._dropout(h, det, spatial)
        h = self._bn("bn2")(h, use_running_average=det)
        h = nn.relu(h)
        h = TorchConvTranspose(
            self.features, self.kernel_size, self.stride, self.padding,
            self.output_padding, self.use_conv_bias, self.dtype, self.param_dtype,
            name="conv2",
        )(h)
        h = checkpoint_name(h, "conv_out")
        h = self._dropout(h, det, spatial)
        residual = x
        if self.use_shortcut:
            residual = TorchConvTranspose(
                self.features, self.kernel_size, self.stride, self.padding,
                self.output_padding, True, self.dtype, self.param_dtype,
                name="shortcut_conv",
            )(x)
            residual = checkpoint_name(residual, "conv_out")
            residual = self._bn("shortcut_bn")(residual, use_running_average=det)
        return self.a * residual + self.b * h


def maybe_remat(block_cls, mode):
    """Per-block rematerialization (cfg.remat).

    ``'blocks'`` (or True): ``jax.checkpoint`` the block — only its input
    is saved for the backward pass; BN/conv/dropout interiors are
    recomputed (same rng replay, bit-identical values).

    ``'conv'``: policy remat — save only the (transpose-)conv outputs
    (tagged ``checkpoint_name 'conv_out'`` above) and recompute the
    elementwise BN/ReLU/dropout interiors in the backward pass. On a
    bandwidth-bound step this drops the saved BN/ReLU activations from
    HBM traffic while keeping the expensive convs un-recomputed.

    static_argnums=(2,) marks ``train`` (self=0, x=1) static so the BN
    train/eval Python branch survives the transform. No-op (returns the
    class) when mode is falsy/'none'."""
    if not mode or mode == "none":
        return block_cls
    if mode == "conv":
        return nn.remat(
            block_cls,
            static_argnums=(2,),
            policy=jax.checkpoint_policies.save_only_these_names("conv_out"),
        )
    return nn.remat(block_cls, static_argnums=(2,))
