"""cfg.torch_init: reference-parity parameter init (models/torch_init.py).

The reference uses torch's layer defaults everywhere (no custom
initializers in networks/). These tests pin our resampled tree to the
SAME distributions torch's reset_parameters draws from — bound checks
against closed forms AND against executed torch layers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.models.mmvae import MMVae
from mopoe_mimic_tpu.models.torch_init import torch_reinit
from mopoe_mimic_tpu.train.state import create_train_state


def _cfg(**kw):
    base = dict(
        method="joint_elbo", dataset="testing", batch_size=4, class_dim=8,
        DIM_img=4, DIM_text=4, img_size=64, text_encoding="word",
        vocab_size=40, compute_dtype="float32",
    )
    base.update(kw)
    return MopoeConfig(**base)


def _batch(cfg):
    return {
        "PA": jnp.zeros((4, 64, 64, 1)),
        "Lateral": jnp.zeros((4, 64, 64, 1)),
        "text": jnp.zeros((4, cfg.len_sequence), jnp.int32),
    }


@pytest.fixture(scope="module")
def trees():
    cfg = _cfg()
    model = MMVae(cfg)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "reparam": jax.random.PRNGKey(2)}
    v = model.init(rngs, _batch(cfg), train=True)
    re = torch_reinit(v["params"], jax.random.PRNGKey(7))
    return v["params"], re


def _leaf(tree, path):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return np.asarray(node)


def test_conv_kernel_matches_torch_bound(trees):
    """Encoder conv kernels: U(+-1/sqrt(Cin*k*k)) — torch Conv2d's
    kaiming_uniform(a=sqrt(5)) closed form, cross-checked against an
    executed torch layer's observed bound."""
    import torch

    _, re = trees
    w = _leaf(re, "encoder_PA/feature_extractor/resblock_1/conv2/kernel")
    k, _, cin, _ = w.shape[0], w.shape[1], w.shape[2], w.shape[3]
    bound = 1.0 / np.sqrt(cin * k * k)
    assert np.abs(w).max() <= bound + 1e-7
    assert np.abs(w).max() > 0.8 * bound  # actually fills the support
    # executed-torch cross-check: same shapes, same observed support
    tw = torch.nn.Conv2d(cin, w.shape[3], k).weight.detach().numpy()
    assert abs(np.abs(tw).max() - np.abs(w).max()) < 0.2 * bound
    # uniform, not normal: std of U(+-b) is b/sqrt(3)
    assert abs(w.std() - bound / np.sqrt(3)) < 0.1 * bound


def test_transpose_kernel_uses_output_fan(trees):
    """Decoder (img_generator) kernels are ConvTranspose in torch, whose
    fan_in is Cout*k*k (weight.size(1) of the (I,O,k,k) layout)."""
    import torch

    _, re = trees
    w = _leaf(re, "decoder_PA/img_generator/resblock_1/conv2/kernel")
    k, cin, cout = w.shape[0], w.shape[2], w.shape[3]
    bound = 1.0 / np.sqrt(cout * k * k)
    assert np.abs(w).max() <= bound + 1e-7
    assert np.abs(w).max() > 0.8 * bound
    tw = torch.nn.ConvTranspose2d(cin, cout, k).weight.detach().numpy()
    assert abs(np.abs(tw).max() - np.abs(w).max()) < 0.2 * bound


def test_dense_and_bias_bounds(trees):
    _, re = trees
    w = _leaf(re, "encoder_PA/feature_compressor/content_mu/kernel")
    b = _leaf(re, "encoder_PA/feature_compressor/content_mu/bias")
    bound = 1.0 / np.sqrt(w.shape[0])
    assert np.abs(w).max() <= bound + 1e-7
    assert np.abs(b).max() <= bound + 1e-7
    assert np.abs(b).max() > 0  # biases are sampled, not zeros


def test_embedding_standard_normal(trees):
    _, re = trees
    e = _leaf(re, "encoder_text/feature_extractor/embedding/embedding")
    assert abs(e.std() - 1.0) < 0.15
    assert abs(e.mean()) < 0.2


def test_batchnorm_untouched(trees):
    orig, re = trees
    for path in (
        "encoder_PA/feature_extractor/resblock_1/bn1/scale",
        "encoder_PA/feature_extractor/resblock_1/bn1/bias",
    ):
        np.testing.assert_array_equal(_leaf(orig, path), _leaf(re, path))
    assert (_leaf(re, "encoder_PA/feature_extractor/resblock_1/bn1/scale")
            == 1.0).all()


def test_knob_flows_through_create_train_state():
    cfg = _cfg(torch_init=True)
    s = create_train_state(cfg, jax.random.PRNGKey(0), _batch(cfg))
    w = _leaf(s.params, "encoder_PA/feature_extractor/resblock_1/conv2/kernel")
    k, cin = w.shape[0], w.shape[2]
    assert np.abs(w).max() <= 1.0 / np.sqrt(cin * k * k) + 1e-7
    # default (torch_init=False) keeps he_normal: values exceed the bound
    s0 = create_train_state(_cfg(), jax.random.PRNGKey(0), _batch(_cfg()))
    w0 = _leaf(s0.params, "encoder_PA/feature_extractor/resblock_1/conv2/kernel")
    assert np.abs(w0).max() > 1.0 / np.sqrt(cin * k * k)
