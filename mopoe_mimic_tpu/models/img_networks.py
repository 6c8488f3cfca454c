"""Image encoder/decoder for the X-ray modalities (PA, Lateral).

Stage topology parity with the reference:
  * FeatureExtractorImg (mimic/networks/FeatureExtractorImg.py:24-81):
    conv stem (k3 s2 p1) + strided residual blocks with channel ramp
    DIM → 2·DIM → 3·DIM → 4·DIM → 5·DIM; the tail depends on img_size
    (64: 4 blocks, last p0; 128: 5 blocks; 256: 5 blocks, 4th has
    stride 4), ending at 1×1 spatial → [B, 5·DIM] features.
  * DataGeneratorImg (mimic/networks/DataGeneratorImg.py:29-98): mirrored
    transpose blocks from [B, 1, 1, 5·DIM] back to img_size, final
    ConvTranspose(k3 s2 p1 op1) to image_channels.
  * EncoderImg/DecoderImg wrappers (mimic/networks/ConvNetworksImgMimic.py):
    LinearFeatureCompressor heads; the decoder emits (mean, 0.75) — a
    Laplace with fixed scale (ConvNetworksImgMimic.py:54).

Layout is NHWC (TPU-native); skip weights a=2.0, b=0.3 as at the
reference call sites.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mopoe_mimic_tpu.models.compressor import LinearFeatureCompressor
from mopoe_mimic_tpu.models.resblocks import (
    ResidualBlockConv,
    ResidualBlockTransposeConv,
    TorchConvTranspose,
    _conv,
    maybe_remat,
)

_A, _B = 2.0, 0.3


class FeatureExtractorImg(nn.Module):
    dim: int
    img_size: int = 128
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    bn_eps: float = 1e-5
    bn_dtype: Optional[jnp.dtype] = None
    remat: bool | str = False
    fused_pointwise: bool = False
    # cfg.rng_recompute_dropout: dropout masks recomputed from the
    # PRNG key in the backward pass (ops/rng_dropout.py) instead of
    # saved as residuals — bit-identical sampling, fewer bytes
    rng_recompute_dropout: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        """x: [B, H, W, C] → [B, 5·dim]."""
        if self.img_size not in (64, 128, 256):
            raise NotImplementedError(f"img_size {self.img_size} unsupported")
        kw = dict(a=_A, b=_B, use_conv_bias=False, channelwise_dropout=True,
                  dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_eps=self.bn_eps, bn_dtype=self.bn_dtype,
                  fused_pointwise=self.fused_pointwise,
                  rng_recompute_dropout=self.rng_recompute_dropout)
        d = self.dim
        Block = maybe_remat(ResidualBlockConv, self.remat)
        h = _conv(d, 3, 2, 1, False, self.dtype, self.param_dtype, "conv1", 2)(x)
        h = Block(2 * d, 4, 2, 1, name="resblock_1", **kw)(h, train)
        h = Block(3 * d, 4, 2, 1, name="resblock_2", **kw)(h, train)
        h = Block(4 * d, 4, 2, 1, name="resblock_3", **kw)(h, train)
        if self.img_size == 64:
            h = Block(5 * d, 4, 2, 0, name="resblock_4", **kw)(h, train)
        elif self.img_size == 128:
            h = Block(5 * d, 4, 2, 1, name="resblock_4", **kw)(h, train)
            h = Block(5 * d, 4, 2, 0, name="resblock_5", **kw)(h, train)
        else:  # 256
            h = Block(5 * d, 4, 4, 1, name="resblock_4", **kw)(h, train)
            h = Block(5 * d, 4, 2, 0, name="resblock_5", **kw)(h, train)
        return h.reshape(h.shape[0], -1)  # [B, 5·dim] (1×1 spatial)


class DataGeneratorImg(nn.Module):
    dim: int
    img_size: int = 128
    image_channels: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    bn_eps: float = 1e-5
    bn_dtype: Optional[jnp.dtype] = None
    remat: bool | str = False
    fused_pointwise: bool = False
    # cfg.rng_recompute_dropout: dropout masks recomputed from the
    # PRNG key in the backward pass (ops/rng_dropout.py) instead of
    # saved as residuals — bit-identical sampling, fewer bytes
    rng_recompute_dropout: bool = False

    @nn.compact
    def __call__(self, feats: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        """feats: [B, 1, 1, 5·dim] → [B, img_size, img_size, image_channels]."""
        kw = dict(a=_A, b=_B, use_conv_bias=False, channelwise_dropout=True,
                  dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_eps=self.bn_eps, bn_dtype=self.bn_dtype,
                  fused_pointwise=self.fused_pointwise,
                  rng_recompute_dropout=self.rng_recompute_dropout)
        d = self.dim
        Block = maybe_remat(ResidualBlockTransposeConv, self.remat)
        h = Block(4 * d, 4, 1, 0, name="resblock_1", **kw)(feats, train)
        h = Block(3 * d, 4, 2, 1, name="resblock_2", **kw)(h, train)
        h = Block(2 * d, 4, 2, 1, name="resblock_3", **kw)(h, train)
        h = Block(1 * d, 4, 2, 1, name="resblock_4", **kw)(h, train)
        if self.img_size >= 128:
            h = Block(1 * d, 4, 2, 1, name="resblock_5", **kw)(h, train)
        if self.img_size == 256:
            h = Block(1 * d, 4, 2, 1, name="resblock_6", **kw)(h, train)
        h = TorchConvTranspose(
            self.image_channels, 3, 2, 1, 1, True, self.dtype, self.param_dtype,
            name="conv_out",
        )(h)
        return h


class EncoderImg(nn.Module):
    """Feature extractor + (style?, content) Gaussian heads.

    feature_extractor selects 'resnet' (the res-block stack) or 'densenet'
    (DenseNet-121 trunk) like --feature_extractor_img
    (ConvNetworksImgMimic.py:10-17)."""

    dim: int
    class_dim: int
    style_dim: int = 0
    img_size: int = 128
    feature_extractor: str = "resnet"
    fixed_extractor: bool = False  # cfg.fixed_image_extractor (densenet only)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    bn_eps: float = 1e-5
    bn_dtype: Optional[jnp.dtype] = None
    remat: bool | str = False
    fused_pointwise: bool = False
    # cfg.rng_recompute_dropout: dropout masks recomputed from the
    # PRNG key in the backward pass (ops/rng_dropout.py) instead of
    # saved as residuals — bit-identical sampling, fewer bytes
    rng_recompute_dropout: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True):
        if self.feature_extractor == "densenet":
            from mopoe_mimic_tpu.models.densenet import DenseNetFeatureExtractor

            h = DenseNetFeatureExtractor(
                5 * self.dim, fixed_extractor=self.fixed_extractor,
                dtype=self.dtype, name="feature_extractor"
            )(x, train=train)
        elif self.feature_extractor == "resnet":
            h = FeatureExtractorImg(
                self.dim, self.img_size, self.dtype, self.param_dtype,
                bn_eps=self.bn_eps, bn_dtype=self.bn_dtype, remat=self.remat,
                fused_pointwise=self.fused_pointwise,
                  rng_recompute_dropout=self.rng_recompute_dropout,
                name="feature_extractor",
            )(x, train=train)
        else:
            raise NotImplementedError(self.feature_extractor)
        return LinearFeatureCompressor(
            self.class_dim, self.style_dim, self.dtype, self.param_dtype,
            name="feature_compressor",
        )(h)


class DecoderImg(nn.Module):
    """Latent(s) → image mean; fixed Laplace scale 0.75 is applied by the
    likelihood layer (ConvNetworksImgMimic.py:54)."""

    dim: int
    class_dim: int
    style_dim: int = 0
    img_size: int = 128
    image_channels: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    bn_eps: float = 1e-5
    bn_dtype: Optional[jnp.dtype] = None
    remat: bool | str = False
    fused_pointwise: bool = False
    # cfg.rng_recompute_dropout: dropout masks recomputed from the
    # PRNG key in the backward pass (ops/rng_dropout.py) instead of
    # saved as residuals — bit-identical sampling, fewer bytes
    rng_recompute_dropout: bool = False

    FIXED_SCALE: float = 0.75

    @nn.compact
    def __call__(
        self,
        z_content: jnp.ndarray,
        z_style: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
    ) -> jnp.ndarray:
        z = z_content if z_style is None else jnp.concatenate([z_style, z_content], axis=-1)
        feats = nn.Dense(
            5 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="feature_generator",
        )(z)
        feats = feats.reshape(feats.shape[0], 1, 1, -1)
        return DataGeneratorImg(
            self.dim, self.img_size, self.image_channels, self.dtype,
            self.param_dtype, bn_eps=self.bn_eps, bn_dtype=self.bn_dtype,
            remat=self.remat, fused_pointwise=self.fused_pointwise,
                  rng_recompute_dropout=self.rng_recompute_dropout,
            name="img_generator",
        )(feats, train=train)
