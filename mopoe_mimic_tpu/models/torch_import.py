"""Torch → flax weight conversion for DenseNet-121 (CheXNet).

The reference initializes its DenseNet classifier / feature extractor from
torchvision's ImageNet weights (mimic/networks/CheXNet.py:14-33). This
converts a torchvision ``densenet121(...).state_dict()`` (loaded offline —
this environment cannot download it) into the parameter pytree of
models.densenet.DenseNet121 / CheXNet:

  * conv kernels OIHW → HWIO
  * batch-norm: weight/bias → scale/bias params; running_mean/var →
    batch_stats mean/var
  * torchvision key scheme features.denseblockB.denselayerL.{norm,conv}{1,2}
    → denseblockB_layerL/{norm,conv}{1,2}; transitions and stem likewise.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW → HWIO


def _flax_path(torch_key: str) -> Tuple[Tuple[str, ...], str, bool]:
    """Returns (module path, leaf name, is_batch_stat)."""
    parts = torch_key.split(".")
    if parts[0] == "classifier":
        return ("classifier",), {"weight": "kernel", "bias": "bias"}[parts[1]], False

    assert parts[0] == "features", torch_key
    rest = parts[1:]
    if rest[0].startswith("denseblock"):
        block = rest[0].replace("denseblock", "")
        layer = rest[1].replace("denselayer", "")
        module = (f"denseblock{block}_layer{layer}", rest[2])
        leaf_key, kind = rest[3], rest[2]
    elif rest[0].startswith("transition"):
        module = (rest[0], rest[1])
        leaf_key, kind = rest[2], rest[1]
    else:  # conv0 / norm0 / norm5
        module = (rest[0],)
        leaf_key, kind = rest[1], rest[0]

    is_norm = kind.startswith("norm")
    if is_norm:
        name = {
            "weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var",
        }[leaf_key]
        return ("features",) + module, name, leaf_key.startswith("running")
    return ("features",) + module, {"weight": "kernel", "bias": "bias"}[leaf_key], False


def convert_densenet_state_dict(
    state_dict: Mapping[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision densenet121 state_dict → (params, batch_stats) pytrees
    shaped for models.densenet.CheXNet (head included when present)."""
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
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        path, leaf, is_stat = _flax_path(key)
        if leaf == "kernel" and arr.ndim == 4:
            arr = _conv_kernel(arr)
        elif leaf == "kernel" and arr.ndim == 2:
            arr = arr.T  # torch Linear [out, in] → flax [in, out]
        insert(stats if is_stat else params, path, leaf, arr)
    return params, stats
