"""Golden numerical parity for the full-model torch importer: instantiate
the ACTUAL reference network modules (torch, CPU), convert their
state_dict with convert_mopoe_state_dict, and assert the flax modules
produce the same eval-mode outputs on the same inputs.

This doubles as a numerical architecture-parity proof: same weights ⇒
same function, for every encoder/decoder of the trimodal VAE.

Reference modules are loaded standalone with their package imports
stubbed (same technique as test_golden_parity.py). Skips when the
reference checkout is absent.
"""

import importlib.util
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference checkout absent")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.models.img_networks import DecoderImg, EncoderImg
from mopoe_mimic_tpu.models.mmvae import MMVae
from mopoe_mimic_tpu.models.text_networks import DecoderText, EncoderText
from mopoe_mimic_tpu.models.torch_import import convert_mopoe_state_dict

DIM = 8
CLASS_DIM = 12
VOCAB = 40
LEN_SEQ = 128
ALPHA = 71


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name, REF / rel)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Reference network modules, loaded with package stubs installed."""
    saved = {
        k: sys.modules.get(k)
        for k in ("mimic", "mimic.networks", "mimic.networks.ResidualBlocks",
                  "mimic.networks.char_encoding", "mimic.networks.word_encoding")
    }
    try:
        for name in ("mimic", "mimic.networks", "mimic.networks.char_encoding",
                     "mimic.networks.word_encoding"):
            sys.modules[name] = types.ModuleType(name)
        res = _load("mimic.networks.ResidualBlocks",
                    "mimic/networks/ResidualBlocks.py")
        out = SimpleNamespace(
            res=res,
            fx_img=_load("ref_fx_img", "mimic/networks/FeatureExtractorImg.py"),
            dg_img=_load("ref_dg_img", "mimic/networks/DataGeneratorImg.py"),
            comp=_load("ref_comp", "mimic/networks/FeatureCompressor.py"),
            fx_char=_load("ref_fx_char",
                          "mimic/networks/char_encoding/FeatureExtractorText.py"),
            dg_char=_load("ref_dg_char",
                          "mimic/networks/char_encoding/DataGeneratorText.py"),
            fx_word=_load("ref_fx_word",
                          "mimic/networks/word_encoding/mmvae_text_enc.py"),
            dg_word=_load("ref_dg_word",
                          "mimic/networks/word_encoding/DataGeneratorText.py"),
        )
        yield out
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _flags(**over):
    base = dict(DIM_img=DIM, DIM_text=DIM, image_channels=1, img_size=64,
                vocab_size=VOCAB, len_sequence=LEN_SEQ, num_features=ALPHA,
                text_gen_lastlayer="softmax")
    base.update(over)
    return SimpleNamespace(**base)


def _cfg(**over):
    base = dict(method="joint_elbo", dataset="testing", img_size=64,
                DIM_img=DIM, DIM_text=DIM, class_dim=CLASS_DIM,
                text_encoding="word", vocab_size=VOCAB,
                compute_dtype="float32")
    base.update(over)
    return MopoeConfig(**base)


def _prefixed(prefix, module):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


def _full_state_dict(ref, flags, text_encoding="word"):
    """Assemble the exact VAEtrimodalMimic state_dict key scheme
    (attribute paths from VAEtrimodalMimic.py:15-20 and
    ConvNetworks{Img,Text}Mimic.py) from reference submodules."""
    torch.manual_seed(0)
    sd = {}
    mods = {}
    for short in ("pa", "lat"):
        fx = ref.fx_img.FeatureExtractorImg(flags)
        comp = ref.comp.LinearFeatureCompressor(5 * DIM, 0, CLASS_DIM)
        gen_lin = torch.nn.Linear(CLASS_DIM, 5 * DIM, bias=True)
        dg = ref.dg_img.DataGeneratorImg(flags)
        sd.update(_prefixed(f"encoder_{short}.feature_extractor", fx))
        sd.update(_prefixed(f"encoder_{short}.feature_compressor", comp))
        sd.update(_prefixed(f"decoder_{short}.feature_generator", gen_lin))
        sd.update(_prefixed(f"decoder_{short}.img_generator", dg))
        mods[short] = (fx, comp, gen_lin, dg)
    if text_encoding == "word":
        fx_t = ref.fx_word.FeatureExtractorText(flags)
        dg_t = ref.dg_word.DataGeneratorText(flags)
    else:
        fx_t = ref.fx_char.FeatureExtractorText(flags)
        dg_t = ref.dg_char.DataGeneratorText(flags)
    comp_t = ref.comp.LinearFeatureCompressor(5 * DIM, 0, CLASS_DIM)
    gen_lin_t = torch.nn.Linear(CLASS_DIM, 5 * DIM, bias=True)
    sd.update(_prefixed("encoder_text.feature_extractor", fx_t))
    sd.update(_prefixed("encoder_text.feature_compressor", comp_t))
    sd.update(_prefixed("decoder_text.feature_generator", gen_lin_t))
    sd.update(_prefixed("decoder_text.text_generator", dg_t))
    mods["text"] = (fx_t, comp_t, gen_lin_t, dg_t)
    return sd, mods


def _assert_close(a, b, tol=2e-4):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    scale = max(1.0, float(np.abs(b).max()))
    assert float(np.abs(a - b).max()) / scale < tol, float(np.abs(a - b).max())


def test_image_paths_match_reference_numerically(ref):
    flags = _flags()
    cfg = _cfg()
    sd, mods = _full_state_dict(ref, flags)
    conv = convert_mopoe_state_dict(sd, cfg)

    fx, comp, gen_lin, dg = mods["pa"]
    rng = np.random.default_rng(0)
    x = rng.random((2, 1, 64, 64)).astype(np.float32)

    for m in (fx, comp, gen_lin, dg):
        m.eval()
    with torch.no_grad():
        h = fx(torch.from_numpy(x))
        mu_t, logvar_t = comp(h)
        z = torch.from_numpy(rng.random((2, CLASS_DIM)).astype(np.float32))
        feats = gen_lin(z).view(2, 5 * DIM, 1, 1)
        img_t = dg(feats).numpy().transpose(0, 2, 3, 1)

    enc = EncoderImg(dim=DIM, class_dim=CLASS_DIM, img_size=64)
    enc_vars = {"params": conv["params"]["encoder_PA"],
                "batch_stats": conv["batch_stats"]["encoder_PA"]}
    mu_j, logvar_j = enc.apply(enc_vars, jnp.asarray(x.transpose(0, 2, 3, 1)),
                               train=False)
    _assert_close(mu_j, mu_t.numpy())
    _assert_close(logvar_j, logvar_t.numpy())

    dec = DecoderImg(dim=DIM, class_dim=CLASS_DIM, img_size=64)
    dec_vars = {"params": conv["params"]["decoder_PA"],
                "batch_stats": conv["batch_stats"]["decoder_PA"]}
    img_j = dec.apply(dec_vars, jnp.asarray(z.numpy()), train=False)
    _assert_close(img_j, img_t)


def test_word_text_paths_match_reference_numerically(ref):
    flags = _flags()
    cfg = _cfg()
    sd, mods = _full_state_dict(ref, flags)
    conv = convert_mopoe_state_dict(sd, cfg)

    fx_t, comp_t, gen_lin_t, dg_t = mods["text"]
    rng = np.random.default_rng(1)
    ids = rng.integers(0, VOCAB, (2, LEN_SEQ))

    for m in (fx_t, comp_t, gen_lin_t, dg_t):
        m.eval()
    with torch.no_grad():
        h = fx_t(torch.from_numpy(ids))
        h = h.view(h.shape[0], -1)
        mu_t, logvar_t = comp_t(h)
        z = torch.from_numpy(rng.random((2, CLASS_DIM)).astype(np.float32))
        feats = gen_lin_t(z).unsqueeze(-1)
        text_t = dg_t(feats).transpose(-2, -1).numpy()  # [B, L, V]

    enc = EncoderText(dim=DIM, class_dim=CLASS_DIM, text_encoding="word",
                      vocab_size=VOCAB, len_sequence=LEN_SEQ)
    enc_vars = {"params": conv["params"]["encoder_text"],
                "batch_stats": conv["batch_stats"]["encoder_text"]}
    mu_j, logvar_j = enc.apply(enc_vars, jnp.asarray(ids), train=False)
    _assert_close(mu_j, mu_t.numpy())
    _assert_close(logvar_j, logvar_t.numpy())

    dec = DecoderText(dim=DIM, class_dim=CLASS_DIM, text_encoding="word",
                      num_features=VOCAB, len_sequence=LEN_SEQ,
                      last_layer="softmax")
    dec_vars = {"params": conv["params"]["decoder_text"],
                "batch_stats": conv["batch_stats"]["decoder_text"]}
    text_j = dec.apply(dec_vars, jnp.asarray(z.numpy()), train=False)
    _assert_close(text_j, text_t)


@pytest.mark.slow
def test_char_text_paths_match_reference_numerically(ref):
    flags = _flags(len_sequence=1024)
    cfg = _cfg(text_encoding="char", len_sequence=1024)
    sd, mods = _full_state_dict(ref, flags, text_encoding="char")
    conv = convert_mopoe_state_dict(sd, cfg)

    fx_t, comp_t, gen_lin_t, dg_t = mods["text"]
    rng = np.random.default_rng(2)
    onehot = np.eye(ALPHA, dtype=np.float32)[rng.integers(0, ALPHA, (2, 1024))]

    for m in (fx_t, comp_t, gen_lin_t, dg_t):
        m.eval()
    with torch.no_grad():
        # char extractor transposes internally (FeatureExtractorText.py:71)
        h = fx_t(torch.from_numpy(onehot))
        h = h.view(h.shape[0], -1)
        mu_t, logvar_t = comp_t(h)
        z = torch.from_numpy(rng.random((2, CLASS_DIM)).astype(np.float32))
        feats = gen_lin_t(z).unsqueeze(-1)
        text_t = dg_t(feats).transpose(-2, -1).numpy()  # [B, 1024, 71]

    enc = EncoderText(dim=DIM, class_dim=CLASS_DIM, text_encoding="char",
                      len_sequence=1024)
    enc_vars = {"params": conv["params"]["encoder_text"],
                "batch_stats": conv["batch_stats"]["encoder_text"]}
    mu_j, logvar_j = enc.apply(enc_vars, jnp.asarray(onehot), train=False)
    _assert_close(mu_j, mu_t.numpy())
    _assert_close(logvar_j, logvar_t.numpy())

    dec = DecoderText(dim=DIM, class_dim=CLASS_DIM, text_encoding="char",
                      num_features=ALPHA, len_sequence=1024)
    dec_vars = {"params": conv["params"]["decoder_text"],
                "batch_stats": conv["batch_stats"]["decoder_text"]}
    text_j = dec.apply(dec_vars, jnp.asarray(z.numpy()), train=False)
    _assert_close(text_j, text_t)


@pytest.mark.slow  # >30s on the 1-core box; excluded from the fast gate
def test_converted_tree_matches_mmvae_init_exactly(ref):
    """The converted pytree is drop-in for MMVae.init's variables: same
    structure, same shapes — and the full model runs with it."""
    flags = _flags()
    cfg = _cfg()
    sd, _ = _full_state_dict(ref, flags)
    conv = convert_mopoe_state_dict(sd, cfg)

    model = MMVae(cfg)
    batch = {
        "PA": jnp.zeros((2, 64, 64, 1), jnp.float32),
        "Lateral": jnp.zeros((2, 64, 64, 1), jnp.float32),
        "text": jnp.zeros((2, LEN_SEQ), jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch, train=False,
    )
    for col in ("params", "batch_stats"):
        want = jax.tree_util.tree_structure(variables[col])
        got = jax.tree_util.tree_structure(conv[col])
        assert want == got, f"{col} tree structure mismatch"
        for (pw, lw), (pg, lg) in zip(
            jax.tree_util.tree_leaves_with_path(variables[col]),
            jax.tree_util.tree_leaves_with_path(conv[col]),
        ):
            assert np.shape(lw) == np.shape(lg), (pw, np.shape(lw), np.shape(lg))

    out, _ = model.apply(
        {"params": conv["params"], "batch_stats": conv["batch_stats"]},
        batch, train=True,
        rngs={"reparam": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(out["joint_divergence"]))


@pytest.mark.slow
def test_import_cli_produces_servable_run_dir(ref, tmp_path):
    """torch .pth → torch_import CLI → InferenceSession.generate: the full
    migration path (MIGRATION.md) on a real reference-format checkpoint."""
    flags = _flags()
    sd, _ = _full_state_dict(ref, flags)
    pth = tmp_path / "mm_vae.pth"
    torch.save(sd, pth)

    from mopoe_mimic_tpu.models.torch_import import main as import_main

    run = tmp_path / "run"
    import_main([
        "--torch_checkpoint", str(pth), "--out_run_dir", str(run),
        "--dataset", "testing", "--img_size", "64", "--DIM_img", str(DIM),
        "--DIM_text", str(DIM), "--class_dim", str(CLASS_DIM),
        "--text_encoding", "word", "--vocab_size", str(VOCAB),
        "--batch_size", "4", "--compute_dtype", "float32",
    ])

    from mopoe_mimic_tpu.serve import InferenceSession

    sess = InferenceSession(run_dir=str(run))
    out = sess.generate(num_samples=2, seed=0)
    assert out["PA"].shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(out["PA"])).all()


def test_factorized_style_heads_convert(ref):
    """style_mu/style_logvar compressor heads and style+content
    feature_generator inputs map by name — factorized checkpoints import."""
    style = 5
    flags = _flags()
    torch.manual_seed(3)
    fx = ref.fx_img.FeatureExtractorImg(flags)
    comp = ref.comp.LinearFeatureCompressor(5 * DIM, style, CLASS_DIM)
    gen_lin = torch.nn.Linear(style + CLASS_DIM, 5 * DIM, bias=True)
    dg = ref.dg_img.DataGeneratorImg(flags)
    sd = {}
    sd.update(_prefixed("encoder_pa.feature_extractor", fx))
    sd.update(_prefixed("encoder_pa.feature_compressor", comp))
    sd.update(_prefixed("decoder_pa.feature_generator", gen_lin))
    sd.update(_prefixed("decoder_pa.img_generator", dg))
    conv = convert_mopoe_state_dict(sd, _cfg())

    for m in (fx, comp, gen_lin, dg):
        m.eval()
    rng = np.random.default_rng(4)
    x = rng.random((2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        mu_s_t, logvar_s_t, mu_c_t, logvar_c_t = comp(fx(torch.from_numpy(x)))
        zs = torch.from_numpy(rng.random((2, style)).astype(np.float32))
        zc = torch.from_numpy(rng.random((2, CLASS_DIM)).astype(np.float32))
        feats = gen_lin(torch.cat([zs, zc], dim=1)).view(2, 5 * DIM, 1, 1)
        img_t = dg(feats).numpy().transpose(0, 2, 3, 1)

    enc = EncoderImg(dim=DIM, class_dim=CLASS_DIM, style_dim=style, img_size=64)
    enc_vars = {"params": conv["params"]["encoder_PA"],
                "batch_stats": conv["batch_stats"]["encoder_PA"]}
    mu_c, logvar_c, mu_s, logvar_s = enc.apply(
        enc_vars, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    _assert_close(mu_c, mu_c_t.numpy())
    _assert_close(logvar_s, logvar_s_t.numpy())

    dec = DecoderImg(dim=DIM, class_dim=CLASS_DIM, style_dim=style, img_size=64)
    dec_vars = {"params": conv["params"]["decoder_PA"],
                "batch_stats": conv["batch_stats"]["decoder_PA"]}
    img_j = dec.apply(dec_vars, jnp.asarray(zc.numpy()), jnp.asarray(zs.numpy()),
                      train=False)
    _assert_close(img_j, img_t)
