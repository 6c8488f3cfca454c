"""InceptionV3 (FID variant) in flax + torch state-dict loader.

The reference embeds FID/PRD samples with the pytorch-fid InceptionV3
checkpoint (mimic/evaluation/fid/inception.py:13, weights ported from the
TF inception-2015-12-05 model). Those weights are not downloadable in this
zero-egress environment, but the *architecture and weight loader* live
here so real-weight FID is a drop-in: point ``cfg.inception_state_dict``
at the ``pt_inception-2015-12-05-*.pth`` file and
``evaluation.embedding.make_default_embedder`` switches to it.

FID-variant deviations from stock torchvision inception_v3 (mirrored from
the pytorch-fid implementation the reference vendors):
  * all branch-pool average poolings use count_include_pad=False
    (FIDInceptionA/C/E1);
  * the LAST InceptionE block (Mixed_7c) uses a MAX pool in its pool
    branch (FIDInceptionE2);
  * aux classifier and fc head are unused — features = 2048-d global
    average pool.

Module names match torchvision exactly (Conv2d_1a_3x3, Mixed_5b.branch1x1,
…) so the state-dict mapping is mechanical: conv OIHW→HWIO, BN
weight/bias→scale/bias + running stats, epsilon 1e-3.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn

from mopoe_mimic_tpu.models.resblocks import TorchBatchNorm
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    """Conv (no bias) + BN(eps=1e-3) + relu — torchvision BasicConv2d."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = (0, 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        pad = self.padding
        if isinstance(pad, tuple) and len(pad) == 2 and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        h = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        h = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=jnp.float32, name="bn")(h)
        return nn.relu(h)


def _avg_pool_nip(x, window=(3, 3), strides=(1, 1), padding=((1, 1), (1, 1))):
    """avg_pool with count_include_pad=False (the FID-variant pooling)."""
    return nn.avg_pool(x, window, strides=strides, padding=padding,
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kw = dict(dtype=self.dtype)
        b1 = BasicConv2d(64, (1, 1), name="branch1x1", **kw)(x, train=train)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1", **kw)(x, train=train)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2", **kw)(b5, train=train)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", **kw)(x, train=train)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2", **kw)(b3, train=train)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3", **kw)(b3, train=train)
        bp = _avg_pool_nip(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool", **kw)(bp, train=train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kw = dict(dtype=self.dtype)
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3", **kw)(x, train=train)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", **kw)(x, train=train)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2", **kw)(bd, train=train)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3", **kw)(bd, train=train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kw = dict(dtype=self.dtype)
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1", **kw)(x, train=train)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1", **kw)(x, train=train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2", **kw)(b7, train=train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3", **kw)(b7, train=train)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1", **kw)(x, train=train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2", **kw)(bd, train=train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3", **kw)(bd, train=train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4", **kw)(bd, train=train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5", **kw)(bd, train=train)
        bp = _avg_pool_nip(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", **kw)(bp, train=train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kw = dict(dtype=self.dtype)
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1", **kw)(x, train=train)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2", **kw)(b3, train=train)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1", **kw)(x, train=train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2", **kw)(b7, train=train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3", **kw)(b7, train=train)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4", **kw)(b7, train=train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"  # 'avg' (Mixed_7b) | 'max' (Mixed_7c, FID variant)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kw = dict(dtype=self.dtype)
        b1 = BasicConv2d(320, (1, 1), name="branch1x1", **kw)(x, train=train)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1", **kw)(x, train=train)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a", **kw)(b3, train=train),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b", **kw)(b3, train=train),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1", **kw)(x, train=train)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2", **kw)(bd, train=train)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a", **kw)(bd, train=train),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b", **kw)(bd, train=train),
        ], axis=-1)
        if self.pool_kind == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_nip(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", **kw)(bp, train=train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """FID feature extractor: [B, H, W, 3] in [0, 1] → [B, 2048].

    resize/normalize follow inception.py:100-120 — bilinear resize to
    299×299, then (0,1) → (-1,1).
    """

    resize_input: bool = True
    normalize_input: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[-1]),
                                 method="bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        kw = dict(dtype=self.dtype)
        h = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3", **kw)(x, train=train)
        h = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", **kw)(h, train=train)
        h = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3", **kw)(h, train=train)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1", **kw)(h, train=train)
        h = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3", **kw)(h, train=train)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = InceptionA(32, name="Mixed_5b", **kw)(h, train=train)
        h = InceptionA(64, name="Mixed_5c", **kw)(h, train=train)
        h = InceptionA(64, name="Mixed_5d", **kw)(h, train=train)
        h = InceptionB(name="Mixed_6a", **kw)(h, train=train)
        h = InceptionC(128, name="Mixed_6b", **kw)(h, train=train)
        h = InceptionC(160, name="Mixed_6c", **kw)(h, train=train)
        h = InceptionC(160, name="Mixed_6d", **kw)(h, train=train)
        h = InceptionC(192, name="Mixed_6e", **kw)(h, train=train)
        h = InceptionD(name="Mixed_7a", **kw)(h, train=train)
        h = InceptionE("avg", name="Mixed_7b", **kw)(h, train=train)
        h = InceptionE("max", name="Mixed_7c", **kw)(h, train=train)
        return jnp.mean(h, axis=(1, 2))  # adaptive avg pool → [B, 2048]


# ---------------------------------------------------------------------------
# torch state-dict conversion (pt_inception-2015-12-05-*.pth)
# ---------------------------------------------------------------------------

def convert_inception_state_dict(
    state_dict: Mapping[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """pytorch-fid InceptionV3 state_dict → (params, batch_stats) for
    InceptionV3FID. Keys look like ``Mixed_5b.branch5x5_1.conv.weight`` /
    ``...bn.running_var``; the fc/AuxLogits head is skipped (features
    only)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def insert(tree, path, leaf, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for key, tensor in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        arr = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor
        )
        *module_path, kind, leaf = parts  # e.g. Mixed_5b, branch1x1, conv, weight
        path = tuple(module_path) + (kind,)
        if kind == "conv":
            assert leaf == "weight", key
            insert(params, path, "kernel", np.transpose(arr, (2, 3, 1, 0)))
        elif kind == "bn":
            if leaf == "weight":
                insert(params, path, "scale", arr)
            elif leaf == "bias":
                insert(params, path, "bias", arr)
            elif leaf == "running_mean":
                insert(stats, path, "mean", arr)
            elif leaf == "running_var":
                insert(stats, path, "var", arr)
            else:
                raise KeyError(key)
        else:
            raise KeyError(f"unrecognized inception key: {key}")
    return params, stats


def load_inception_embedder(path: str, batch_size: int = 64):
    """Build fn(images [N,H,W,C] in [0,1]) → [N, 2048] from a
    pt_inception .pth file. Raises FileNotFoundError when absent so the
    caller can fall back (evaluation/embedding.py)."""
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(f"inception state dict not found: {path}")
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params, stats = convert_inception_state_dict(sd)
    model = InceptionV3FID()

    # pinned to device once — as jit args, host arrays would re-upload
    # the weights every call (evaluation/clf_loader.py)
    variables = jax.device_put({"params": params, "batch_stats": stats})

    def _apply(v, x):
        return model.apply(v, x, train=False)

    features = jax.jit(lambda x: _apply(variables, x))

    def embed(images: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(images), batch_size):
            chunk = np.asarray(images[i : i + batch_size], dtype=np.float32)
            if len(chunk) < batch_size:  # static shapes for jit
                pad = np.repeat(chunk[-1:], batch_size - len(chunk), axis=0)
                out.append(np.asarray(features(np.concatenate([chunk, pad])))[: len(chunk)])
            else:
                out.append(np.asarray(features(chunk)))
        return np.concatenate(out)

    # pure apply + variables: inlineable into larger jitted programs with
    # the weights passed as arguments (see evaluation/clf_loader.py)
    embed.device_apply = _apply
    embed.device_variables = variables
    return embed
