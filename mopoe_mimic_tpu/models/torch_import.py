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
        arr = np.array(  # COPY: .numpy() aliases live torch storage —
            # without the copy, a later torch optimizer.step() would
            # silently mutate the "imported" weights (golden trajectory bug)
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        path, leaf, is_stat = _flax_path(key)
        if leaf == "kernel" and arr.ndim == 4:
            arr = _conv_kernel(arr)
        elif leaf == "kernel" and arr.ndim == 2:
            arr = arr.T  # torch Linear [out, in] → flax [in, out]
        insert(stats if is_stat else params, path, leaf, arr)
    return params, stats


# ---------------------------------------------------------------------------
# Full MoPoE model import: reference VAEtrimodalMimic state_dict → MMVae
# ---------------------------------------------------------------------------
#
# Key scheme (reference module attribute paths, VAEtrimodalMimic.py:15-20):
#   encoder_pa.feature_extractor.conv1.weight
#   encoder_pa.feature_extractor.resblock_K.0.{bn1,conv1,bn2,conv2}.*
#   encoder_pa.feature_extractor.resblock_K.0.downsample.{0,1}.*   (shortcut)
#   encoder_pa.feature_compressor.{content,style}_{mu,logvar}.{weight,bias}
#   decoder_pa.feature_generator.{weight,bias}
#   decoder_pa.img_generator.generator.N[.0].*        (Sequential; last = out conv)
#   encoder_text.feature_extractor.{embedding,conv1,resblock_K.0}.*
#   decoder_text.text_generator.resblock_K.0.* / .conv2.*          (char)
#   decoder_text.text_generator.generator.N[.0].*                  (word)
#
# Weight-layout rules (each verified numerically against torch in
# tests/test_torch_mopoe_import.py):
#   Conv{1,2}d   (O,I,k…)  → (k…, I, O)
#   ConvTranspose{1,2}d (I,O,k…) → spatial flip, then (k…, I, O) — our
#       TorchConvTranspose computes input-dilated CORRELATION, torch's
#       transposed conv is the input-dilated CONVOLUTION of the same kernel
#   Linear (O,I) → (I,O);  Embedding (V,D) → unchanged
#   BatchNorm weight/bias → params scale/bias; running_mean/var →
#       batch_stats mean/var; num_batches_tracked dropped

_MOPOE_TOP = {
    "encoder_pa": "encoder_PA", "decoder_pa": "decoder_PA",
    "encoder_lat": "encoder_Lateral", "decoder_lat": "decoder_Lateral",
    "encoder_text": "encoder_text", "decoder_text": "decoder_text",
}

_BN_LEAF = {"weight": ("scale", False), "bias": ("bias", False),
            "running_mean": ("mean", True), "running_var": ("var", True)}


def _torch_conv_w(w: np.ndarray) -> np.ndarray:
    """Conv{1,2}d (O,I,k…) → flax (k…, I, O)."""
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    return np.transpose(w, (2, 1, 0))


def _torch_convT_w(w: np.ndarray) -> np.ndarray:
    """ConvTranspose{1,2}d (I,O,k…) → TorchConvTranspose (k…, I, O)."""
    if w.ndim == 4:
        return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))
    return np.transpose(w[:, :, ::-1], (2, 0, 1))


def _block_leaf(rest, transpose: bool):
    """['0', 'bn1', 'weight'] inside a res-block → (module, leaf, is_stat,
    conv transform or None). Reference blocks are Sequential-wrapped, hence
    the leading '0' (ResidualBlocks.py via the make_res_block_* factories)."""
    assert rest[0] == "0", rest
    sub, leaf = rest[1], rest[-1]
    if sub in ("downsample", "upsample"):
        which = rest[2]
        if which == "0":  # projection conv — always bias=True in the reference
            return "shortcut_conv", {"weight": "kernel", "bias": "bias"}[leaf], False, (
                _torch_convT_w if sub == "upsample" else _torch_conv_w)
        name, is_stat = _BN_LEAF[leaf]
        return "shortcut_bn", name, is_stat, None
    if sub.startswith("bn"):
        name, is_stat = _BN_LEAF[leaf]
        return sub, name, is_stat, None
    assert sub.startswith("conv"), rest
    return sub, {"weight": "kernel", "bias": "bias"}[leaf], False, (
        _torch_convT_w if transpose else _torch_conv_w)


def convert_mopoe_state_dict(state_dict: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """Reference VAEtrimodalMimic (or VAETextMimic) ``state_dict`` →
    ``{"params": ..., "batch_stats": ...}`` for models.mmvae.MMVae built
    from the same config — migrate a trained reference checkpoint without
    retraining. Per-module numerical equivalence (same weights ⇒ same
    eval-mode outputs) is pinned by tests/test_torch_mopoe_import.py.

    Dropped keys: BN ``num_batches_tracked`` and — at
    ``len_sequence ≤ 500`` — the word encoder's ``resblock_7/8``, which the
    reference constructs but never runs (mmvae_text_enc.py:51-85)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def insert(tree, path, leaf, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    word_mode = getattr(cfg, "text_encoding", "word") == "word"
    short_word = word_mode and getattr(cfg, "len_sequence", 128) <= 500

    for key, tensor in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = np.array(  # COPY — see comment in convert_state_dict
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor
        )
        parts = key.split(".")
        top = _MOPOE_TOP.get(parts[0])
        if top is None:
            raise KeyError(f"unrecognized top-level module in {key!r}")
        group, rest = parts[1], parts[2:]

        if group in ("feature_compressor", "feature_generator"):
            mod_path = (top, group) if group == "feature_compressor" else (top,)
            sub_path = (rest[0],) if group == "feature_compressor" else ("feature_generator",)
            leaf = {"weight": "kernel", "bias": "bias"}[rest[-1]]
            insert(params, mod_path + sub_path, leaf,
                   arr.T if leaf == "kernel" else arr)
            continue

        if group == "feature_extractor":
            base = (top, "feature_extractor")
            if rest[0] == "embedding":
                insert(params, base + ("embedding",), "embedding", arr)
            elif rest[0] == "conv1":
                leaf = {"weight": "kernel", "bias": "bias"}[rest[-1]]
                insert(params, base + ("conv1",), leaf,
                       _torch_conv_w(arr) if leaf == "kernel" else arr)
            else:
                assert rest[0].startswith("resblock"), key
                if short_word and top == "encoder_text" and rest[0] in (
                        "resblock_7", "resblock_8"):
                    continue  # constructed-but-never-run in the reference
                sub, leaf, is_stat, tf = _block_leaf(rest[1:], transpose=False)
                insert(stats if is_stat else params, base + (rest[0], sub),
                       leaf, tf(arr) if tf and leaf == "kernel" else arr)
            continue

        if group in ("img_generator", "text_generator"):
            gen_name = "img_generator" if group == "img_generator" else "text_generator"
            base = (top, gen_name)
            if rest[0] == "generator":  # Sequential (img / word-text)
                idx = int(rest[1])
                if rest[2] == "0":  # a res-block
                    sub, leaf, is_stat, tf = _block_leaf(rest[2:], transpose=True)
                    insert(stats if is_stat else params,
                           base + (f"resblock_{idx + 1}", sub), leaf,
                           tf(arr) if tf and leaf == "kernel" else arr)
                else:  # the final output layer; word@128 is a plain Conv1d
                    plain = group == "text_generator" and short_word
                    leaf = {"weight": "kernel", "bias": "bias"}[rest[-1]]
                    tf = _torch_conv_w if plain else _torch_convT_w
                    insert(params, base + ("conv_out",), leaf,
                           tf(arr) if leaf == "kernel" else arr)
            elif rest[0] == "conv2":  # char generator's named output ConvT
                leaf = {"weight": "kernel", "bias": "bias"}[rest[-1]]
                insert(params, base + ("conv2",), leaf,
                       _torch_convT_w(arr) if leaf == "kernel" else arr)
            else:
                assert rest[0].startswith("resblock"), key  # char generator
                sub, leaf, is_stat, tf = _block_leaf(rest[1:], transpose=True)
                insert(stats if is_stat else params, base + (rest[0], sub),
                       leaf, tf(arr) if tf and leaf == "kernel" else arr)
            continue

        raise KeyError(f"unrecognized module group in {key!r}")

    return {"params": params, "batch_stats": stats}


def load_torch_mopoe(path: str, cfg) -> Dict[str, Any]:
    """``torch.load`` a reference checkpoint file and convert
    (convert_mopoe_state_dict). Accepts either a bare state_dict or the
    reference's save format (VAEtrimodalMimic.py:155-163 saves per-module
    files; a full-model state_dict is their prefixed union)."""
    import torch

    obj = torch.load(path, map_location="cpu")
    state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return convert_mopoe_state_dict(state, cfg)


def main(argv=None) -> None:
    """Checkpoint-migration CLI: a trained reference (torch) model →
    a run directory this framework's serving/eval stack consumes.

        python -m mopoe_mimic_tpu.models.torch_import \
            --torch_checkpoint mm_vae.pth --out_run_dir RUN \
            --img_size 128 --DIM_img 64 --DIM_text 64 --class_dim 64 \
            --text_encoding word --vocab_size 3517

    Writes RUN/config.json + an orbax checkpoint at RUN/checkpoints/0
    (fresh optimizer state at step 0 — the reference never saved one),
    ready for ``python -m mopoe_mimic_tpu.serve --run_dir RUN`` or
    ``--start_epoch``-style fine-tuning."""
    import json
    import os

    from mopoe_mimic_tpu.config import MopoeConfig

    p = MopoeConfig.parser()
    p.add_argument("--torch_checkpoint", required=True)
    p.add_argument("--out_run_dir", required=True)
    args = p.parse_args(argv)
    cfg = MopoeConfig.from_namespace(args)

    import jax

    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.train.state import create_train_state
    from mopoe_mimic_tpu.utils.checkpoints import CheckpointManager

    converted = load_torch_mopoe(args.torch_checkpoint, cfg)
    sample, _ = next(iter(BatchLoader(
        SyntheticMimic(cfg, seed=0, length=cfg.batch_size), cfg.batch_size,
        shuffle=False,
    )))
    state = create_train_state(cfg, jax.random.PRNGKey(cfg.seed or 0), sample)
    state = state.replace(
        params=jax.tree.map(jnp_asarray, converted["params"]),
        batch_stats=jax.tree.map(jnp_asarray, converted["batch_stats"]),
    )
    os.makedirs(args.out_run_dir, exist_ok=True)
    with open(os.path.join(args.out_run_dir, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f, indent=2, default=str)
    mgr = CheckpointManager(
        os.path.join(args.out_run_dir, "checkpoints"), async_save=False
    )
    mgr.save(0, state, force=True)
    mgr.wait_until_finished()
    print(f"imported {args.torch_checkpoint} -> {args.out_run_dir}")


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(np.ascontiguousarray(x))


if __name__ == "__main__":
    main()
