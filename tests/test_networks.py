"""Shape-parity tests for the network zoo against the reference stage
topologies (FeatureExtractorImg.py:62-80, DataGeneratorImg.py:93-98,
char/word text nets)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from mopoe_mimic_tpu.models import DecoderImg, EncoderImg
from mopoe_mimic_tpu.models.resblocks import TorchConvTranspose
from mopoe_mimic_tpu.models.text_networks import DecoderText, EncoderText

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
DROP = {"dropout": jax.random.PRNGKey(2)}


def _run(mod, x, **kw):
    v = mod.init(RNGS, x, train=True, **kw)
    y, _ = mod.apply(v, x, train=True, rngs=DROP, mutable=["batch_stats"], **kw)
    return v, y


@pytest.mark.parametrize(
    "k,s,p,op,inp,expected",
    [
        (4, 2, 1, 0, 4, 8),     # standard upsample ×2
        (4, 1, 0, 0, 1, 4),     # stem block 1→4
        (3, 2, 1, 1, 64, 128),  # output layer
        (4, 4, 1, 0, 4, 14),    # stride-4 (torch: (4-1)*4-2+4=14)
    ],
)
def test_conv_transpose_matches_torch_shape_formula(k, s, p, op, inp, expected):
    import torch

    tm = torch.nn.ConvTranspose2d(3, 5, k, s, p, output_padding=op)
    torch_out = tm(torch.zeros(1, 3, inp, inp)).shape[-1]
    assert torch_out == expected
    m = TorchConvTranspose(5, k, s, p, op)
    x = jnp.zeros((1, inp, inp, 3))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, expected, expected, 5)


@pytest.mark.parametrize("img_size", [64, 128])
def test_img_encoder_decoder_shapes(img_size):
    x = jnp.zeros((2, img_size, img_size, 1))
    enc = EncoderImg(dim=2, class_dim=6, img_size=img_size)
    _, out = _run(enc, x)
    mu, lv = out
    assert mu.shape == (2, 6) and lv.shape == (2, 6)
    dec = DecoderImg(dim=2, class_dim=6, img_size=img_size)
    _, y = _run(dec, mu)
    assert y.shape == (2, img_size, img_size, 1)


@pytest.mark.slow
def test_img_256_shapes():
    # 256px branch: stride-4 resblock_4 in the extractor, two extra
    # upsample blocks in the generator (FeatureExtractorImg.py:53-60,
    # DataGeneratorImg.py:71-87)
    x = jnp.zeros((1, 256, 256, 1))
    enc = EncoderImg(dim=1, class_dim=4, img_size=256)
    _, (mu, lv) = _run(enc, x)
    assert mu.shape == (1, 4)
    dec = DecoderImg(dim=1, class_dim=4, img_size=256)
    _, y = _run(dec, mu)
    assert y.shape == (1, 256, 256, 1)


def test_img_encoder_style_heads():
    x = jnp.zeros((2, 64, 64, 1))
    enc = EncoderImg(dim=2, class_dim=6, style_dim=3, img_size=64)
    _, out = _run(enc, x)
    assert len(out) == 4
    assert out[2].shape == (2, 3)  # style mu


def test_char_text_shapes():
    x = jnp.zeros((2, 1024, 71))
    enc = EncoderText(dim=2, class_dim=6, text_encoding="char")
    _, (mu, lv) = _run(enc, x)
    assert mu.shape == (2, 6)
    dec = DecoderText(dim=2, class_dim=6, text_encoding="char", num_features=71, len_sequence=1024)
    _, y = _run(dec, mu)
    assert y.shape == (2, 1024, 71)
    # log-softmax output: exp sums to 1 over the alphabet axis
    s = float(jnp.exp(y[0, 0]).sum())
    assert abs(s - 1.0) < 1e-3


def test_word_text_shapes():
    ids = jnp.ones((2, 128), jnp.int32)
    enc = EncoderText(dim=2, class_dim=6, text_encoding="word", vocab_size=50, len_sequence=128)
    _, (mu, lv) = _run(enc, ids)
    assert mu.shape == (2, 6)
    dec = DecoderText(dim=2, class_dim=6, text_encoding="word", num_features=50, len_sequence=128)
    _, y = _run(dec, mu)
    assert y.shape == (2, 128, 50)


def test_word_embedding_padding_idx_zero():
    # id 0 must embed to the zero vector (mmvae_text_enc.py:27-29)
    from mopoe_mimic_tpu.models.text_networks import FeatureExtractorTextWord

    ids = jnp.zeros((1, 128), jnp.int32)
    fe = FeatureExtractorTextWord(dim=2, vocab_size=10, len_sequence=128)
    v = fe.init(RNGS, ids, train=True)
    emb_table = v["params"]["embedding"]["embedding"]
    # apply up to the masking: emulate by calling with all-zero ids and
    # checking the conv stem sees zeros — easiest is to check the mask math
    import numpy as np

    emb = np.asarray(emb_table)[np.asarray(ids)]
    masked = emb * (np.asarray(ids) != 0)[..., None]
    assert np.allclose(masked, 0.0)


def test_bn_eps_knob_propagates():
    """cfg.bn_eps reaches every BatchNorm in the stack: with eps far above
    any activation variance (1e2), EVERY BatchNorm divides its input by
    ~sqrt(eps), so the head output collapses by orders of magnitude. (A
    small-eps monotonicity check is NOT a true property — downstream BNs
    renormalize whatever the previous BN emitted, so small-eps deltas can
    go either way depending on backend codegen.)"""
    x = jnp.ones((4, 64, 64, 1), jnp.float32)

    def head_scale(eps):
        enc = EncoderImg(dim=2, class_dim=4, img_size=64, bn_eps=eps)
        v = enc.init(RNGS, x, train=True)
        (mu, _lv), _ = enc.apply(
            v, x, train=True, rngs=DROP, mutable=["batch_stats"])
        return float(jnp.abs(mu).max())

    # identical params (same init rng), only eps differs; the huge-eps
    # head is ~1e3x smaller PER BatchNorm traversed (4 orders of
    # magnitude total here) — a machine-independent margin
    assert head_scale(1e2) < 1e-2 * head_scale(1e-5)


def test_bn_eps_flows_from_config():
    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.models.mmvae import MMVae

    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", batch_size=2, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=20, compute_dtype="float32", bn_eps=1e-2,
    )
    model = MMVae(cfg)
    batch = {
        "PA": jnp.zeros((2, 64, 64, 1)),
        "Lateral": jnp.zeros((2, 64, 64, 1)),
        "text": jnp.zeros((2, 128), jnp.int32),
    }
    rngs = {**RNGS, "reparam": jax.random.PRNGKey(3)}
    v = model.init(rngs, batch, train=True)
    assert model.config.bn_eps == 1e-2
    out, _ = model.apply(
        v, batch, train=True,
        rngs={"dropout": jax.random.PRNGKey(2), "reparam": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    import numpy as np

    mu, _lv = out["group_distr"]
    assert np.isfinite(float(mu.sum()))


@pytest.mark.slow
def test_fixed_image_extractor_freezes_densenet_trunk():
    """cfg.fixed_image_extractor (reference flags.py:31, CheXNet.py:23-25,
    36-44): the DenseNet trunk gets exactly-zero gradients while the head
    still trains — in the CheXNet classifier and the VAE feature-extractor
    variant alike."""
    import numpy as np

    from mopoe_mimic_tpu.models.densenet import CheXNet, DenseNetFeatureExtractor

    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 1)), jnp.float32)

    def max_abs(tree):
        return max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(tree))

    for frozen in (False, True):
        for model, target in (
            (CheXNet(n_labels=3, fixed_extractor=frozen),
             jnp.asarray(np.random.default_rng(1).random((2, 3)), jnp.float32)),
            (DenseNetFeatureExtractor(8, fixed_extractor=frozen), None),
        ):
            variables = model.init(jax.random.PRNGKey(0), x, train=False)

            def loss_fn(params):
                out = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    x, train=False,
                )
                return jnp.sum((out - target) ** 2 if target is not None else out ** 2)

            grads = jax.grad(loss_fn)(variables["params"])
            trunk = max_abs(grads["features"])
            head_key = "classifier" if "classifier" in grads else "proj"
            assert max_abs(grads[head_key]) > 0.0
            if frozen:
                assert trunk == 0.0, f"frozen trunk leaked gradient: {trunk}"
            else:
                assert trunk > 0.0


def test_torch_batchnorm_running_stats_parity():
    """TorchBatchNorm stores UNBIASED running variance like torch
    (Bessel n/(n-1)); flax nn.BatchNorm stores the biased one — a +14%
    running-var skew at n=8 that breaks eval-mode trajectory parity for
    the 1x1-spatial encoder tails. Pin mean/var/output against the real
    torch.nn.BatchNorm2d over several train steps + one eval step."""
    torch = pytest.importorskip("torch")
    from mopoe_mimic_tpu.models.resblocks import TorchBatchNorm

    rng = np.random.default_rng(3)
    feat, B, H, W = 5, 8, 1, 1  # n = 8: the worst-case tail geometry
    bn_t = torch.nn.BatchNorm2d(feat)  # momentum 0.1 = flax 0.9
    bn_j = TorchBatchNorm(momentum=0.9, epsilon=1e-5)
    xs = [rng.standard_normal((B, H, W, feat)).astype(np.float32) * (i + 1)
          for i in range(4)]
    variables = bn_j.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]),
                          use_running_average=False)
    stats = variables["batch_stats"]
    bn_t.train()
    for x in xs:
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        with torch.no_grad():
            yt = bn_t(xt)
        yj, mut = bn_j.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x), use_running_average=False,
            mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]
        np.testing.assert_allclose(
            np.asarray(yj), yt.numpy().transpose(0, 2, 3, 1), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats["mean"]), bn_t.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(stats["var"]), bn_t.running_var.numpy(), rtol=1e-6)
    # eval mode: normalize with the (unbiased) running stats
    bn_t.eval()
    x = xs[-1]
    with torch.no_grad():
        yt = bn_t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    yj = bn_j.apply({"params": variables["params"], "batch_stats": stats},
                    jnp.asarray(x), use_running_average=True)
    np.testing.assert_allclose(
        np.asarray(yj), yt.numpy().transpose(0, 2, 3, 1), atol=1e-5)
