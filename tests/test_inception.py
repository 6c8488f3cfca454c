"""InceptionV3 (FID variant) architecture + torch weight loader
(models/inception.py; reference mimic/evaluation/fid/inception.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mopoe_mimic_tpu.models.inception import (
    InceptionV3FID, convert_inception_state_dict,
)


def _template(resize=False, hw=96):
    model = InceptionV3FID(resize_input=resize)
    return model, jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((2, hw, hw, 3)), train=False)
    )


def test_structure_and_output_shape():
    model, variables = _template()
    params = variables["params"]
    # torchvision module names present (mechanical state-dict mapping)
    for name in ("Conv2d_1a_3x3", "Mixed_5b", "Mixed_6e", "Mixed_7c"):
        assert name in params, sorted(params)
    assert "branch1x1" in params["Mixed_5b"]
    assert "branch7x7dbl_5" in params["Mixed_6e"]
    assert "branch3x3_2a" in params["Mixed_7c"]
    # FID feature dim
    out = jax.eval_shape(
        lambda v: model.apply(v, jnp.zeros((2, 96, 96, 3)), train=False),
        variables,
    )
    assert out.shape == (2, 2048)
    # canonical channel ramp: Mixed_5b consumes 192, Mixed_7b consumes 1280
    assert params["Mixed_5b"]["branch1x1"]["conv"]["kernel"].shape[2] == 192
    assert params["Mixed_7b"]["branch1x1"]["conv"]["kernel"].shape[2] == 1280
    assert params["Mixed_7c"]["branch1x1"]["conv"]["kernel"].shape[2] == 2048


def _synth_torch_sd(params, stats):
    """Inverse of convert_inception_state_dict from flax template shapes."""
    sd = {}

    def walk(tree, path, is_stats):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + [k], is_stats)
                continue
            mod = ".".join(path)
            rng = np.random.default_rng(abs(hash((mod, k))) % 2 ** 31)
            arr = rng.standard_normal([int(d) for d in v.shape]).astype(np.float32)
            if k == "kernel":
                # fan-in scaling keeps 100 random layers numerically bounded
                fan_in = int(np.prod(v.shape[:3]))
                sd[f"{mod}.weight"] = np.transpose(
                    arr / np.sqrt(fan_in), (3, 2, 0, 1)
                )
            elif k == "scale":
                sd[f"{mod}.weight"] = 1.0 + 0.05 * arr
            elif k == "bias":
                sd[f"{mod}.bias"] = 0.05 * arr
            elif k == "mean":
                sd[f"{mod}.running_mean"] = 0.05 * arr
            elif k == "var":
                sd[f"{mod}.running_var"] = np.full(v.shape, 1.0, np.float32)
            else:
                raise KeyError(k)

    walk(params, [], False)
    walk(stats, [], True)
    return sd


def test_converter_maps_every_parameter():
    _, variables = _template()
    t_params, t_stats = variables["params"], variables["batch_stats"]
    sd = _synth_torch_sd(t_params, t_stats)
    # fc / aux heads in the file must be ignored
    sd["fc.weight"] = np.zeros((1008, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1008,), np.float32)
    params, stats = convert_inception_state_dict(sd)

    def assert_same_structure(a, b, path=""):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            if isinstance(a[k], dict):
                assert_same_structure(a[k], b[k], f"{path}/{k}")
            else:
                assert tuple(a[k].shape) == tuple(b[k].shape), (path, k)

    assert_same_structure(params, t_params)
    assert_same_structure(stats, t_stats)


@pytest.mark.slow
def test_forward_runs_with_converted_weights():
    model, variables = _template(resize=False, hw=96)
    sd = _synth_torch_sd(variables["params"], variables["batch_stats"])
    params, stats = convert_inception_state_dict(sd)
    x = np.random.default_rng(0).random((2, 96, 96, 3)).astype(np.float32)
    out = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(
            {"params": params, "batch_stats": stats}, x
        )
    )
    assert out.shape == (2, 2048) and np.isfinite(out).all()
    assert abs(out[0] - out[1]).max() > 0  # inputs differ → features differ
