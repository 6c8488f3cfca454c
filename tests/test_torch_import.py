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


# ---------------------------------------------------------------------------
# functional parity against a REAL torch DenseNet-121
# ---------------------------------------------------------------------------

def _torch_densenet121(n_labels: int):
    """A genuine torch DenseNet-121 with torchvision's exact module/key
    scheme (torchvision itself is not installed here; this follows the
    DenseNet-BC paper config 6/12/24/16, growth 32 — the same state_dict
    keys `features.denseblockB.denselayerL.*`, `features.transitionT.*`,
    `features.{conv0,norm0,norm5}`, `classifier.*`)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from collections import OrderedDict

    growth = 32

    class DenseLayer(nn.Module):
        def __init__(self, in_ch):
            super().__init__()
            self.norm1 = nn.BatchNorm2d(in_ch)
            self.conv1 = nn.Conv2d(in_ch, 4 * growth, 1, bias=False)
            self.norm2 = nn.BatchNorm2d(4 * growth)
            self.conv2 = nn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

        def forward(self, x):
            h = self.conv1(F.relu(self.norm1(x)))
            h = self.conv2(F.relu(self.norm2(h)))
            return torch.cat([x, h], 1)

    class Transition(nn.Module):
        def __init__(self, in_ch, out_ch):
            super().__init__()
            self.norm = nn.BatchNorm2d(in_ch)
            self.conv = nn.Conv2d(in_ch, out_ch, 1, bias=False)

        def forward(self, x):
            return F.avg_pool2d(self.conv(F.relu(self.norm(x))), 2, 2)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            feats = OrderedDict()
            feats["conv0"] = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            feats["norm0"] = nn.BatchNorm2d(64)
            feats["relu0"] = nn.ReLU(inplace=True)
            feats["pool0"] = nn.MaxPool2d(3, stride=2, padding=1)
            ch = 64
            for bi, n_layers in enumerate((6, 12, 24, 16)):
                block = OrderedDict()
                for li in range(n_layers):
                    block[f"denselayer{li + 1}"] = DenseLayer(ch)
                    ch += growth
                feats[f"denseblock{bi + 1}"] = nn.Sequential(block)
                if bi != 3:
                    feats[f"transition{bi + 1}"] = Transition(ch, ch // 2)
                    ch //= 2
            feats["norm5"] = nn.BatchNorm2d(ch)
            self.features = nn.Sequential(feats)
            self.classifier = nn.Linear(ch, n_labels)

        def forward(self, x):
            h = F.relu(self.features(x))
            h = F.adaptive_avg_pool2d(h, 1).flatten(1)
            return torch.sigmoid(self.classifier(h))

    return Net()


@pytest.mark.slow
def test_densenet_functional_parity_with_torch():
    """Converted torch weights must reproduce the torch forward pass —
    validates BN semantics, padding, pooling, and layout transposes, which
    the roundtrip test cannot."""
    import torch

    torch.manual_seed(0)
    net = _torch_densenet121(n_labels=3)
    # randomize BN affine + running stats so a swapped mapping cannot pass
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.1)
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()

    x = np.random.default_rng(1).random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    params, stats = convert_densenet_state_dict(net.state_dict())
    model = CheXNet(n_labels=3)
    out = np.asarray(
        model.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), train=False)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)
