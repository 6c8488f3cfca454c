"""DenseNet-121 (CheXNet) in flax — the reference's pretrained-DenseNet
classifier and alternative VAE image feature extractor
(mimic/networks/CheXNet.py:14-106; selected via --img_clf_type densenet /
--feature_extractor_img densenet).

The reference loads torchvision's ImageNet weights; in this zero-egress
environment the network trains from scratch. ``load_torch_state_dict``
maps a torchvision densenet121 state_dict onto these parameters when one
is available offline (kernel layout OIHW→HWIO, BN stat renames).

Architecture: standard DenseNet-BC (32 growth, blocks 6/12/24/16),
channel-last.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn

from mopoe_mimic_tpu.models.resblocks import TorchBatchNorm
import jax
import jax.numpy as jnp

GROWTH = 32
BLOCK_CONFIG = (6, 12, 24, 16)


class _DenseLayer(nn.Module):
    growth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        h = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        h = nn.relu(h)
        h = nn.Conv(4 * self.growth, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(h)
        h = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="norm2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class _Transition(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        h = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(h)
        return nn.avg_pool(h, (2, 2), strides=(2, 2))


class DenseNet121(nn.Module):
    """Trunk → [B, 1024] features (after global pooling)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv0")(x)
        h = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="norm0")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        features = 64
        for bi, n_layers in enumerate(BLOCK_CONFIG):
            for li in range(n_layers):
                h = _DenseLayer(GROWTH, self.dtype,
                                name=f"denseblock{bi + 1}_layer{li + 1}")(h, train=train)
                features += GROWTH
            if bi != len(BLOCK_CONFIG) - 1:
                features //= 2
                h = _Transition(features, self.dtype,
                                name=f"transition{bi + 1}")(h, train=train)
        h = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="norm5")(h)
        h = nn.relu(h)
        return jnp.mean(h, axis=(1, 2))  # global average pool → [B, 1024]


class CheXNet(nn.Module):
    """DenseNet-121 + sigmoid multi-label head (CheXNet.py:14-33).

    n_crops > 1 reproduces the Five/TenCrop path: input
    [B·n_crops, H, W, C] → predictions averaged over crops
    (main_train_clf_mimic.py:67-72)."""

    n_labels: int
    n_crops: int = 1
    fixed_extractor: bool = False  # cfg.fixed_image_extractor
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)  # grayscale → RGB stem
        feats = DenseNet121(self.dtype, name="features")(x, train=train)
        if self.fixed_extractor:
            # torch parity: requires_grad=False on the trunk
            # (CheXNet.py:23-25) — BN running stats still update in train
            # mode, exactly like torch; only gradients stop here.
            feats = jax.lax.stop_gradient(feats)
        logits = nn.Dense(self.n_labels, dtype=self.dtype, name="classifier")(feats)
        probs = nn.sigmoid(logits)
        if self.n_crops > 1:
            probs = probs.reshape(-1, self.n_crops, self.n_labels).mean(axis=1)
        return probs


class DenseNetFeatureExtractor(nn.Module):
    """VAE image feature extractor variant (CheXNet.py:85-106): DenseNet
    trunk → linear to 5·DIM_img features, so EncoderImg's compressor is
    interchangeable with the res-block extractor."""

    out_features: int
    n_crops: int = 1
    fixed_extractor: bool = False  # cfg.fixed_image_extractor
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        feats = DenseNet121(self.dtype, name="features")(x, train=train)
        if self.fixed_extractor:
            # --fixed_image_extractor (flags.py:31, PretrainedDenseNet
            # CheXNet.py:36-44): trunk params get zero gradient, the
            # projection head (and the VAE around it) still trains.
            feats = jax.lax.stop_gradient(feats)
        if self.n_crops > 1:
            feats = feats.reshape(-1, self.n_crops, feats.shape[-1]).mean(axis=1)
        return nn.Dense(self.out_features, dtype=self.dtype, name="proj")(feats)
