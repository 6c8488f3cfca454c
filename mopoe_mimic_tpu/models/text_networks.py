"""Text encoder/decoder for the radiology-report modality.

Two encodings, like the reference:
  * char: one-hot [B, 1024, 71] → 1-D conv stem + 8 strided res-blocks down
    to length 1 (char_encoding/FeatureExtractorText.py:28-81); decoder
    mirrors with transpose blocks + ConvTranspose to the alphabet and a
    log-softmax over the class axis (char_encoding/DataGeneratorText.py:26-78).
  * word: token ids [B, 128] → embedding (padding idx 0 → zero vector) →
    conv stem + 6 res-blocks (8 when len_sequence > 500)
    (word_encoding/mmvae_text_enc.py:23-85); decoder depth branches on
    len_sequence (≥512: 8 blocks + ConvTranspose to vocab; 128: 6 blocks +
    1×1 conv), last layer none/log-softmax/sigmoid
    (word_encoding/DataGeneratorText.py:30-98).

Layout NLC (length, channel-last). The reference decodes text in
sub-batches "to spare GPU memory" (ConvNetworksTextMimic.py:59-66); under
XLA static memory planning that workaround is unnecessary and omitted.
"""

from __future__ import annotations

from typing import Optional

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


class FeatureExtractorTextChar(nn.Module):
    dim: int
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
        """x: [B, 1024, num_features] one-hot → [B, 5·dim]."""
        kw = dict(a=_A, b=_B, dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_eps=self.bn_eps, bn_dtype=self.bn_dtype,
                  fused_pointwise=self.fused_pointwise,
                  rng_recompute_dropout=self.rng_recompute_dropout)
        d = self.dim
        Block = maybe_remat(ResidualBlockConv, self.remat)
        h = _conv(d, 4, 2, 1, True, self.dtype, self.param_dtype, "conv1", 1)(x)
        widths = [2 * d, 3 * d, 4 * d, 4 * d, 4 * d, 5 * d, 5 * d]
        for i, w in enumerate(widths, start=1):
            h = Block(w, 4, 2, 1, name=f"resblock_{i}", **kw)(h, train)
        h = Block(5 * d, 4, 2, 0, name="resblock_8", **kw)(h, train)
        return h.reshape(h.shape[0], -1)


class DataGeneratorTextChar(nn.Module):
    dim: int
    num_features: int
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
        """feats: [B, 1, 5·dim] → log-softmax logits [B, 1024, num_features]."""
        kw = dict(a=_A, b=_B, dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_eps=self.bn_eps, bn_dtype=self.bn_dtype,
                  fused_pointwise=self.fused_pointwise,
                  rng_recompute_dropout=self.rng_recompute_dropout)
        d = self.dim
        Block = maybe_remat(ResidualBlockTransposeConv, self.remat)
        h = Block(5 * d, 4, 1, 0, name="resblock_1", **kw)(feats, train)
        widths = [5 * d, 5 * d, 4 * d, 4 * d, 3 * d, 2 * d, 1 * d]
        for i, w in enumerate(widths, start=2):
            h = Block(w, 4, 2, 1, name=f"resblock_{i}", **kw)(h, train)
        h = TorchConvTranspose(
            self.num_features, 4, 2, 1, 0, True, self.dtype, self.param_dtype,
            name="conv2",
        )(h)
        return nn.log_softmax(h, axis=-1)


class FeatureExtractorTextWord(nn.Module):
    dim: int
    vocab_size: int
    len_sequence: int = 128
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
    def __call__(self, ids: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        """ids: [B, L] int → [B, 5·dim]."""
        kw = dict(a=_A, b=_B, dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_eps=self.bn_eps, bn_dtype=self.bn_dtype,
                  fused_pointwise=self.fused_pointwise,
                  rng_recompute_dropout=self.rng_recompute_dropout)
        d = self.dim
        ids = ids.astype(jnp.int32)
        emb = nn.Embed(
            self.vocab_size, d, dtype=self.dtype, param_dtype=self.param_dtype,
            name="embedding",
        )(ids)
        # padding_idx=0 semantics (mmvae_text_enc.py:27-29). Reference
        # quirk mirrored on purpose: index 0 is <exc> (unknown), not <pad>
        # (MimicDataset.py:359) — torch zeroes+freezes the <exc> row.
        emb = emb * (ids != 0)[..., None].astype(emb.dtype)
        Block = maybe_remat(ResidualBlockConv, self.remat)
        h = _conv(d, 4, 2, 1, True, self.dtype, self.param_dtype, "conv1", 1)(emb)
        widths = [2 * d, 3 * d, 4 * d, 4 * d, 4 * d, 5 * d]
        for i, w in enumerate(widths, start=1):
            h = Block(w, 4, 2, 1, name=f"resblock_{i}", **kw)(h, train)
        if self.len_sequence > 500:
            h = Block(5 * d, 4, 2, 1, name="resblock_7", **kw)(h, train)
            h = Block(5 * d, 4, 2, 0, name="resblock_8", **kw)(h, train)
        return h.reshape(h.shape[0], -1)


class DataGeneratorTextWord(nn.Module):
    dim: int
    vocab_size: int
    len_sequence: int = 128
    last_layer: str = "softmax"  # none | softmax | sigmoid
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
    def __call__(
        self, feats: jnp.ndarray, *, train: bool = True, prehead: bool = False
    ) -> jnp.ndarray:
        """``prehead=True`` (word, len 128 only) returns the features
        BEFORE the vocab head so the caller can fuse head + log-prob
        (ops/pallas_texthead.py). The head conv's params are still
        created/bound (via a 1-position dummy application that XLA
        dead-code-eliminates) so the parameter tree is identical in both
        modes — checkpoints are interchangeable."""
        kw = dict(a=_A, b=_B, dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_eps=self.bn_eps, bn_dtype=self.bn_dtype,
                  fused_pointwise=self.fused_pointwise,
                  rng_recompute_dropout=self.rng_recompute_dropout)
        d = self.dim
        Block = maybe_remat(ResidualBlockTransposeConv, self.remat)
        h = Block(5 * d, 4, 1, 0, name="resblock_1", **kw)(feats, train)
        h = Block(5 * d, 4, 2, 1, name="resblock_2", **kw)(h, train)
        h = Block(5 * d, 4, 2, 1, name="resblock_3", **kw)(h, train)
        h = Block(4 * d, 4, 2, 1, name="resblock_4", **kw)(h, train)
        h = Block(4 * d, 4, 2, 1, name="resblock_5", **kw)(h, train)
        if self.len_sequence >= 512:
            h = Block(3 * d, 4, 2, 1, name="resblock_6", **kw)(h, train)
            h = Block(2 * d, 4, 2, 1, name="resblock_7", **kw)(h, train)
            h = Block(1 * d, 4, 2, 1, name="resblock_8", **kw)(h, train)
            h = TorchConvTranspose(
                self.vocab_size, 4, 2, 1, 0, True, self.dtype, self.param_dtype,
                name="conv_out",
            )(h)
        elif self.len_sequence == 128:
            h = Block(1 * d, 4, 2, 1, name="resblock_6", **kw)(h, train)
            conv_out = _conv(
                self.vocab_size, 1, 1, 0, True, self.dtype, self.param_dtype,
                "conv_out", 1,
            )
            if prehead:
                _ = conv_out(h[:, :1, :])  # bind params only; output unused
                return h
            h = conv_out(h)
        else:
            raise NotImplementedError(
                f"len_sequence {self.len_sequence} unsupported (128 or >=512)"
            )
        if self.last_layer == "softmax":
            return nn.log_softmax(h, axis=-1)
        if self.last_layer == "sigmoid":
            return nn.sigmoid(h)
        if self.last_layer == "none":
            return h
        raise NotImplementedError(self.last_layer)


class EncoderText(nn.Module):
    """Char- or word-encoded report → (mu, logvar [, style])."""

    dim: int
    class_dim: int
    style_dim: int = 0
    text_encoding: str = "char"
    vocab_size: int = 0
    len_sequence: int = 1024
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
        if self.text_encoding == "char":
            h = FeatureExtractorTextChar(
                self.dim, self.dtype, self.param_dtype,
                bn_eps=self.bn_eps, bn_dtype=self.bn_dtype, remat=self.remat,
                fused_pointwise=self.fused_pointwise,
                  rng_recompute_dropout=self.rng_recompute_dropout,
                name="feature_extractor",
            )(x, train=train)
        elif self.text_encoding == "word":
            h = FeatureExtractorTextWord(
                self.dim, self.vocab_size, self.len_sequence, self.dtype,
                self.param_dtype, bn_eps=self.bn_eps, bn_dtype=self.bn_dtype,
                remat=self.remat, fused_pointwise=self.fused_pointwise,
                  rng_recompute_dropout=self.rng_recompute_dropout,
                name="feature_extractor",
            )(x, train=train)
        else:
            raise NotImplementedError(self.text_encoding)
        return LinearFeatureCompressor(
            self.class_dim, self.style_dim, self.dtype, self.param_dtype,
            name="feature_compressor",
        )(h)


class DecoderText(nn.Module):
    """Latent(s) → per-position class logits [B, L, num_features]."""

    dim: int
    class_dim: int
    style_dim: int = 0
    text_encoding: str = "char"
    num_features: int = 71  # alphabet (char) or vocab (word)
    len_sequence: int = 1024
    last_layer: str = "softmax"
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
    def __call__(
        self,
        z_content: jnp.ndarray,
        z_style: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
        prehead: bool = False,
    ) -> jnp.ndarray:
        if prehead and (self.text_encoding != "word" or self.len_sequence != 128):
            raise NotImplementedError(
                "prehead fusion requires word encoding with len_sequence 128"
            )
        z = z_content if z_style is None else jnp.concatenate([z_style, z_content], axis=-1)
        feats = nn.Dense(
            5 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="feature_generator",
        )(z)
        feats = feats.reshape(feats.shape[0], 1, -1)
        if self.text_encoding == "char":
            return DataGeneratorTextChar(
                self.dim, self.num_features, self.dtype, self.param_dtype,
                bn_eps=self.bn_eps, bn_dtype=self.bn_dtype, remat=self.remat,
                fused_pointwise=self.fused_pointwise,
                  rng_recompute_dropout=self.rng_recompute_dropout,
                name="text_generator",
            )(feats, train=train)
        return DataGeneratorTextWord(
            self.dim, self.num_features, self.len_sequence, self.last_layer,
            self.dtype, self.param_dtype, bn_eps=self.bn_eps,
            bn_dtype=self.bn_dtype, remat=self.remat,
            fused_pointwise=self.fused_pointwise,
                  rng_recompute_dropout=self.rng_recompute_dropout,
            name="text_generator",
        )(feats, train=train, prehead=prehead)
