"""Torch-default parameter initialization (reference-parity init).

The reference never sets custom initializers, so every layer carries
torch's defaults (torch.nn.modules.conv/linear/sparse reset_parameters):

- ``Conv{1,2}d`` / ``Linear``: kaiming_uniform(a=sqrt(5)) over fan_in =
  C_in * prod(kernel), which simplifies to U(+-1/sqrt(fan_in)); bias
  U(+-1/sqrt(fan_in)) with the SAME fan_in.
- ``ConvTranspose{1,2}d``: same formula, but torch computes fan_in from
  weight.size(1) — the OUTPUT channels for a transpose weight (I,O,k..)
  — so the bound is 1/sqrt(C_out * prod(kernel)).
- ``Embedding``: N(0, 1).
- ``BatchNorm``: weight=1, bias=0 — identical to this package's
  defaults, left untouched.

This package's own default is he_normal + zero biases (flax idiom);
std differs from torch's by 2.45x on convs. The gap is invisible to
golden tests (they import torch weights) but shifts the from-scratch
training plateau: the round-5 convergence race measured a systematic
+1.55% eval-ELBO offset at matched config that this knob exists to
isolate (RESULTS_r5.md §1). Enable with ``cfg.torch_init=True``.

Implementation: rather than threading initializer objects through every
module, the freshly-initialized param tree is RE-SAMPLED in place by
walking it (the tree's shapes, names, and nesting fully determine each
leaf's torch distribution — transpose convs are exactly the conv
kernels under the decoders' ``img_generator``/``text_generator``
scopes, models/torch_import.py:96-133 documents the same layout map).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

__all__ = ["torch_reinit"]

# path components whose conv kernels are TorchConvTranspose (torch
# ConvTranspose*d there; see models/torch_import.py layout map)
_TRANSPOSE_SCOPES = ("img_generator", "text_generator")


def _fan_in(path, shape) -> int:
    """torch's reset_parameters fan_in for the kernel at `path`."""
    if len(shape) == 2:  # Dense (in, out) — torch Linear fan_in = in
        return int(shape[0])
    rf = int(np.prod(shape[:-2]))  # receptive field
    if any(p in _TRANSPOSE_SCOPES for p in path):
        # transpose kernel (k.., I, O): torch fan_in = O * rf
        return int(shape[-1]) * rf
    return int(shape[-2]) * rf  # conv kernel (k.., I, O): I * rf


def torch_reinit(params: Dict[str, Any], rng: jax.Array) -> Dict[str, Any]:
    """Resample every conv/dense kernel+bias and embedding of `params`
    with torch's default distributions; leave BatchNorm scale/bias (and
    any other kernel-less leaves) untouched. Deterministic in `rng` and
    the key-sorted tree order."""
    flat = flatten_dict(params)
    out = dict(flat)
    for i, (path, leaf) in enumerate(sorted(flat.items())):
        name = path[-1]
        key = jax.random.fold_in(rng, i)
        if name == "embedding":
            out[path] = jax.random.normal(key, leaf.shape, leaf.dtype)
        elif name == "kernel":
            bound = 1.0 / math.sqrt(_fan_in(path, leaf.shape))
            out[path] = jax.random.uniform(
                key, leaf.shape, leaf.dtype, -bound, bound)
        elif name == "bias" and path[:-1] + ("kernel",) in flat:
            kshape = flat[path[:-1] + ("kernel",)].shape
            bound = 1.0 / math.sqrt(_fan_in(path, kshape))
            out[path] = jax.random.uniform(
                key, leaf.shape, leaf.dtype, -bound, bound)
        # else: BN scale/bias, odd leaves — keep as initialized
    return unflatten_dict(out)
