"""Standalone loader/builder for the EXECUTED PyTorch reference.

Loads the reference's real model + loss chain (VAEtrimodalMimic,
BaseMMVae, losses.py, Modality likelihoods) from the read-only checkout
with only the torchvision/plotting imports stubbed, exactly as the
golden-parity test fixtures do (tests/test_golden_mmvae_core.py:56-265)
but as plain functions a benchmark script can call in its own process.

Used by benchmarks/convergence_race.py (stochastic-regime convergence
race, VERDICT r4 #1) and benchmarks/eval_parity.py (whole-suite eval
parity on shared weights, VERDICT r4 #2).

Reference call paths exercised: mimic/utils/BaseMMVae.py (inference,
poe, moe fusion), mimic/networks/VAEtrimodalMimic.py,
mimic/evaluation/losses.py (calc_log_probs, calc_joint_elbo_loss),
mimic/modalities/* (calc_log_prob with torch.distributions).
"""

from __future__ import annotations

import importlib.util
import logging
import sys
import types
from itertools import chain, combinations
from pathlib import Path
from types import SimpleNamespace

REF = Path("/root/reference")


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name, REF / rel)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Install the reference's module graph under ``mimic.*`` (with
    torchvision and plotting stubbed) and return handles. Process-global:
    call once per process (scripts, not test suites, use this)."""
    mimic_pkg = types.ModuleType("mimic")
    mimic_pkg.log = logging.getLogger("ref_harness")
    sys.modules["mimic"] = mimic_pkg
    for pkg in ("mimic.utils", "mimic.evaluation",
                "mimic.evaluation.divergence_measures", "mimic.networks"):
        sys.modules[pkg] = types.ModuleType(pkg)

    _load("mimic.utils.exceptions", "mimic/utils/exceptions.py")
    uu = _load("mimic.utils.utils", "mimic/utils/utils.py")
    sys.modules["mimic.utils"].utils = uu
    _load("mimic.evaluation.divergence_measures.kl_div",
          "mimic/evaluation/divergence_measures/kl_div.py")
    _load("mimic.evaluation.divergence_measures.mm_div",
          "mimic/evaluation/divergence_measures/mm_div.py")
    _load("mimic.utils.BaseMMVae", "mimic/utils/BaseMMVae.py")

    _load("mimic.networks.ResidualBlocks", "mimic/networks/ResidualBlocks.py")
    _load("mimic.networks.FeatureExtractorImg",
          "mimic/networks/FeatureExtractorImg.py")
    _load("mimic.networks.DataGeneratorImg", "mimic/networks/DataGeneratorImg.py")
    _load("mimic.networks.FeatureCompressor", "mimic/networks/FeatureCompressor.py")
    chex_stub = types.ModuleType("mimic.networks.CheXNet")
    chex_stub.PretrainedDenseNet = object
    chex_stub.DenseNetFeatureExtractor = object
    sys.modules["mimic.networks.CheXNet"] = chex_stub

    fx_char = _load("mimic.networks.char_encoding.FeatureExtractorText",
                    "mimic/networks/char_encoding/FeatureExtractorText.py")
    dg_char = _load("mimic.networks.char_encoding.DataGeneratorText",
                    "mimic/networks/char_encoding/DataGeneratorText.py")
    char_pkg = types.ModuleType("mimic.networks.char_encoding")
    char_pkg.FeatureExtractorText = fx_char.FeatureExtractorText
    char_pkg.DataGeneratorText = dg_char.DataGeneratorText
    sys.modules["mimic.networks.char_encoding"] = char_pkg

    dg_word = _load("mimic.networks.word_encoding.DataGeneratorText",
                    "mimic/networks/word_encoding/DataGeneratorText.py")
    word_pkg = types.ModuleType("mimic.networks.word_encoding")
    word_pkg.DataGeneratorText = dg_word.DataGeneratorText
    sys.modules["mimic.networks.word_encoding"] = word_pkg
    _load("mimic.networks.word_encoding.mmvae_text_enc",
          "mimic/networks/word_encoding/mmvae_text_enc.py")

    conv_img = _load("mimic.networks.ConvNetworksImgMimic",
                     "mimic/networks/ConvNetworksImgMimic.py")
    conv_text = _load("mimic.networks.ConvNetworksTextMimic",
                      "mimic/networks/ConvNetworksTextMimic.py")
    vae = _load("mimic.networks.VAEtrimodalMimic",
                "mimic/networks/VAEtrimodalMimic.py")

    # ---- loss + modality chain (losses.py imports bare `evaluation.*`
    # and `utils`: the reference runs from inside mimic/) ----
    ev = types.ModuleType("evaluation")
    ev_dm = types.ModuleType("evaluation.divergence_measures")
    sys.modules["evaluation"] = ev
    sys.modules["evaluation.divergence_measures"] = ev_dm
    sys.modules["evaluation.divergence_measures.kl_div"] = sys.modules[
        "mimic.evaluation.divergence_measures.kl_div"]
    utils_pkg = types.ModuleType("utils")
    utils_pkg.utils = uu
    sys.modules["utils"] = utils_pkg

    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv.transforms
    ss = types.ModuleType("mimic.utils.save_samples")
    ss.write_samples_img_to_file = lambda *a, **k: None
    ss.write_samples_text_to_file = lambda *a, **k: None
    ss.save_generated_samples_singlegroup = lambda *a, **k: None
    sys.modules["mimic.utils.save_samples"] = ss
    pl = types.ModuleType("mimic.utils.plot")
    pl.text_to_pil = lambda *a, **k: None
    sys.modules["mimic.utils.plot"] = pl
    tx = types.ModuleType("mimic.utils.text")
    tx.tensor_to_text = lambda *a, **k: None
    sys.modules["mimic.utils.text"] = tx

    modalities_pkg = types.ModuleType("mimic.modalities")
    sys.modules["mimic.modalities"] = modalities_pkg
    mimic_pkg.modalities = modalities_pkg
    mod_utils = _load("mimic.modalities.utils", "mimic/modalities/utils.py")
    modalities_pkg.utils = mod_utils
    _load("mimic.modalities.Modality", "mimic/modalities/Modality.py")
    pa = _load("mimic.modalities.MimicPA", "mimic/modalities/MimicPA.py")
    lat = _load("mimic.modalities.MimicLateral", "mimic/modalities/MimicLateral.py")
    txt = _load("mimic.modalities.MimicText", "mimic/modalities/MimicText.py")
    losses = _load("mimic.evaluation.losses", "mimic/evaluation/losses.py")
    lik = _load("mimic.utils.likelihood", "mimic/utils/likelihood.py")

    return SimpleNamespace(
        vae=vae, conv_img=conv_img, conv_text=conv_text,
        losses=losses, likelihood=lik, utils=uu,
        MimicPA=pa.MimicPA, MimicLateral=lat.MimicLateral,
        MimicText=txt.MimicText,
    )


def load_reference_eval(ref):
    """Additionally load the reference's EVAL stack — the real
    eval_metrics/{representation,coherence,likelihood}.py with their real
    dependency chain (dataio loaders, Metrics, text codec), for the
    whole-suite eval-parity run (benchmarks/eval_parity.py).

    Returns a namespace with the three eval modules + text utils.
    Call after load_reference() (reuses its module graph)."""
    # the real text codec (tensor_to_text/seq2text) replaces the stub
    text_mod = _load("mimic.utils.text", "mimic/utils/text.py")
    sys.modules["mimic"].utils = sys.modules["mimic.utils"]
    sys.modules["mimic.utils"].text = text_mod

    fh = _load("mimic.utils.filehandling", "mimic/utils/filehandling.py")
    sys.modules["mimic.utils"].filehandling = fh

    # torchvision stub needs the names dataio.utils touches at def time
    tv = sys.modules["torchvision"]
    for name in ("Compose", "ToPILImage", "Resize", "ToTensor", "Normalize",
                 "CenterCrop", "FiveCrop", "TenCrop", "Lambda", "Grayscale"):
        setattr(tv.transforms, name,
                (lambda *a, **k: (lambda x: x)))

    dataio_pkg = types.ModuleType("mimic.dataio")
    sys.modules["mimic.dataio"] = dataio_pkg
    sys.modules["mimic"].dataio = dataio_pkg
    dio = _load("mimic.dataio.utils", "mimic/dataio/utils.py")
    dataio_pkg.utils = dio

    # experiment shim: eval modules import MimicExperiment for type hints
    exp_stub = types.ModuleType("mimic.utils.experiment")
    exp_stub.MimicExperiment = type("MimicExperiment", (), {})
    sys.modules["mimic.utils.experiment"] = exp_stub

    chex = sys.modules["mimic.networks.CheXNet"]
    chex.CheXNet = object  # classifiers.utils imports it; never built here

    clf_pkg = types.ModuleType("mimic.networks.classifiers")
    sys.modules["mimic.networks.classifiers"] = clf_pkg
    sys.modules["mimic.networks"].classifiers = clf_pkg
    _load("mimic.networks.ConvNetworkImgClf",
          "mimic/networks/ConvNetworkImgClf.py")
    _load("mimic.networks.ConvNetworkTextClf",
          "mimic/networks/ConvNetworkTextClf.py")
    clf_utils = _load("mimic.networks.classifiers.utils",
                      "mimic/networks/classifiers/utils.py")
    clf_pkg.utils = clf_utils

    em_pkg = types.ModuleType("mimic.evaluation.eval_metrics")
    sys.modules["mimic.evaluation.eval_metrics"] = em_pkg
    sys.modules["mimic.evaluation"].eval_metrics = em_pkg
    rep = _load("mimic.evaluation.eval_metrics.representation",
                "mimic/evaluation/eval_metrics/representation.py")
    coh = _load("mimic.evaluation.eval_metrics.coherence",
                "mimic/evaluation/eval_metrics/coherence.py")
    lik = _load("mimic.evaluation.eval_metrics.likelihood",
                "mimic/evaluation/eval_metrics/likelihood.py")
    return SimpleNamespace(representation=rep, coherence=coh,
                           likelihood=lik, text=text_mod,
                           Metrics=clf_utils.Metrics)


def make_flags(method="joint_elbo", *, dim=8, class_dim=16, img_size=64,
               vocab_size=50, len_sequence=128, batch_size=32, lr=1e-3):
    """Reference flag namespace at parameterized scale (defaults are the
    convergence-race scale: small enough for torch CPU to reach plateau)."""
    f = SimpleNamespace(
        DIM_img=dim, DIM_text=dim, image_channels=1, img_size=img_size,
        vocab_size=vocab_size, len_sequence=len_sequence,
        num_features=vocab_size, text_gen_lastlayer="softmax",
        feature_extractor_img="resnet", class_dim=class_dim,
        batch_size=batch_size, device="cpu",
        factorized_representation=False,
        style_pa_dim=0, style_lat_dim=0, style_text_dim=0,
        modality_moe=(method == "moe"), modality_jsd=(method == "jsd"),
        modality_poe=(method == "poe"), joint_elbo=(method == "joint_elbo"),
        alpha_modalities=[0.25, 0.25, 0.25, 0.25],
        text_encoding="word",
        initial_learning_rate=lr, beta_1=0.9, beta_2=0.999,
        beta=1.0, beta_style=1.0, beta_content=1.0,
    )
    w = 1.0 / 3.0
    f.rec_weight_m1 = f.rec_weight_m2 = f.rec_weight_m3 = w
    f.beta_m1_style = f.beta_m2_style = f.beta_m3_style = 1.0
    return f


def build_model(ref, flags, seed=0):
    """Reference VAEtrimodalMimic wired through the REAL modality objects
    (torch.distributions likelihoods), seeded init. Returns (model, mods,
    exp_shim) where exp_shim satisfies losses.py's `exp` argument."""
    import torch

    torch.manual_seed(seed)
    mods = {}
    for name in ("PA", "Lateral", "text"):
        if name == "text":
            enc = ref.conv_text.EncoderText(flags, style_dim=0)
            dec = ref.conv_text.DecoderText(flags, style_dim=0)
            mods[name] = ref.MimicText(
                enc, dec, flags.len_sequence, None, None, flags)
        else:
            enc = ref.conv_img.EncoderImg(flags, style_dim=0)
            dec = ref.conv_img.DecoderImg(flags, style_dim=0)
            cls = ref.MimicPA if name == "PA" else ref.MimicLateral
            mods[name] = cls(enc, dec, flags)
    xs = list(mods)
    subsets = {}
    for combo in chain.from_iterable(combinations(xs, n) for n in range(4)):
        subsets["_".join(sorted(combo))] = [mods[m] for m in sorted(combo)]
    model = ref.vae.VAEtrimodalMimic(flags, mods, subsets)

    exp = SimpleNamespace(
        flags=flags, modalities=mods,
        rec_weights={"PA": flags.rec_weight_m1, "Lateral": flags.rec_weight_m2,
                     "text": flags.rec_weight_m3},
        style_weights={"PA": flags.beta_m1_style, "Lateral": flags.beta_m2_style,
                       "text": flags.beta_m3_style},
    )
    return model, mods, exp


def total_loss_fn(ref, exp, model, torch_batch):
    """The reference's real loss assembly for the joint-ELBO family
    (run_epochs.basic_routine_epoch:52-96 → losses.py)."""
    results = model(torch_batch)
    _, weighted = ref.losses.calc_log_probs(exp, results, (torch_batch, None))
    return ref.losses.calc_joint_elbo_loss(
        exp, None, results["joint_divergence"], exp.flags.beta_style,
        exp.flags.beta_content, weighted, exp.flags.beta)
