"""DenseNet torch→flax conversion: synthesize a state_dict with the exact
torchvision key scheme and check the converted pytree loads into our
DenseNet-121 (shape-exact), and a converted forward runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mopoe_mimic_tpu.models.densenet import CheXNet
from mopoe_mimic_tpu.models.torch_import import convert_densenet_state_dict


def _synthetic_torch_state_dict(template_params, template_stats):
    """Invert the conversion's key mapping from our flax template so the
    test stays in sync with the real torchvision naming."""
    sd = {}

    def walk(tree, path, is_stats):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + [k], is_stats)
                continue
            # path like ['features', 'denseblock1_layer1', 'norm1'] or
            # ['features', 'conv0'] / ['classifier']
            mods = list(path)
            if mods[0] == "features" and "_layer" in mods[1]:
                block, layer = mods[1].split("_layer")
                torch_mod = f"features.{block}.denselayer{layer}.{mods[2]}"
            elif mods[0] == "features" and len(mods) == 3:
                torch_mod = f"features.{mods[1]}.{mods[2]}"
            elif mods[0] == "features":
                torch_mod = f"features.{mods[1]}"
            else:
                torch_mod = mods[0]
            leaf = {
                "kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var",
            }[k]
            arr = np.asarray(v)
            if k == "kernel" and arr.ndim == 4:
                arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO → OIHW
            elif k == "kernel" and arr.ndim == 2:
                arr = arr.T
            sd[f"{torch_mod}.{leaf}"] = arr

    walk(template_params, [], False)
    walk(template_stats, [], True)
    return sd


@pytest.mark.slow
def test_densenet_roundtrip_conversion():
    model = CheXNet(n_labels=3)
    x = jnp.zeros((1, 64, 64, 1))
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False
    ))()
    t_params = jax.device_get(variables["params"])
    t_stats = jax.device_get(variables["batch_stats"])
    sd = _synthetic_torch_state_dict(t_params, t_stats)
    assert any(k.startswith("features.denseblock1.denselayer1.") for k in sd)

    params, stats = convert_densenet_state_dict(sd)
    # shape-exact match with the template
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(params)[0], key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_flatten_with_path(t_params)[0], key=lambda kv: str(kv[0])),
    ):
        assert str(pa) == str(pb), (pa, pb)
        assert a.shape == b.shape, (pa, a.shape, b.shape)
        np.testing.assert_array_equal(a, b)  # roundtrip is lossless

    out = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert out.shape == (1, 3)
