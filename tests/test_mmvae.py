"""MMVae core: inference/fusion semantics per method + a 2-step train test
on the synthetic dataset (the reference's central integration pattern,
mimic/tests/test_training.py:19-123, shrunk to fit the CPU test budget)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.models.mmvae import MMVae
from mopoe_mimic_tpu.train import create_train_state, make_train_step
from mopoe_mimic_tpu.train.state import make_optimizer

TINY = dict(
    batch_size=8,
    class_dim=4,
    DIM_img=2,
    DIM_text=2,
    img_size=64,
    text_encoding="word",
    vocab_size=50,
    dataset="testing",
    compute_dtype="float32",
)


def _batch(cfg, seed=0):
    ds = SyntheticMimic(cfg, seed=seed)
    loader = BatchLoader(ds, cfg.batch_size, shuffle=False)
    return next(iter(loader))[0]


def _init(cfg, batch):
    model = MMVae(cfg)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "reparam": jax.random.PRNGKey(2),
    }
    variables = model.init(rngs, batch, train=False)
    return model, variables


@pytest.mark.slow  # >70s on the 1-core box; excluded from the fast gate
@pytest.mark.parametrize("method", ["joint_elbo", "moe", "poe", "jsd"])
def test_forward_structure_per_method(method):
    cfg = MopoeConfig(method=method, **TINY)
    cfg = cfg.replace(vocab_size=3517)
    batch = _batch(cfg)
    model, variables = _init(cfg, batch)
    # train mode: eval-mode BN running stats are meaningless on a fresh
    # model (they only converge over training), so finiteness is asserted
    # on the batch-stat path
    out, _ = model.apply(
        variables, batch, train=True,
        rngs={"reparam": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    # 7 subsets enumerated for 3 modalities, reference key order
    assert set(out["latents"]["subsets"].keys()) == {
        "PA", "Lateral", "text", "Lateral_PA", "PA_text", "Lateral_text",
        "Lateral_PA_text",
    }
    # mixture component count per method (BaseMMVae.py:126-188)
    expected_k = {"joint_elbo": 7, "moe": 3, "poe": 1, "jsd": 4}[method]
    assert out["latents"]["mus"].shape[0] == expected_k
    assert out["rec"]["PA"].shape == (cfg.batch_size, 64, 64, 1)
    assert out["rec"]["text"].shape == (cfg.batch_size, 128, 3517)
    assert np.isfinite(float(out["joint_divergence"]))


def test_inference_poe_subset_math_matches_manual():
    """joint_elbo subset posteriors must equal hand-computed PoE products."""
    cfg = MopoeConfig(method="joint_elbo", **TINY)
    batch = _batch(cfg)
    model, variables = _init(cfg, batch)
    out = model.apply(
        variables, batch, train=False, rngs={"reparam": jax.random.PRNGKey(3)},
        method=lambda m, b, train=False: m.inference(b, train=train),
    )
    mods = out["modalities"]
    mu_pa, lv_pa = mods["PA"]
    mu_lat, lv_lat = mods["Lateral"]
    # manual PoE for subset {PA, Lateral}
    eps = 1e-8
    t1, t2 = 1 / (np.exp(np.asarray(lv_pa)) + eps), 1 / (np.exp(np.asarray(lv_lat)) + eps)
    var = 1 / (t1 + t2)
    mu = (np.asarray(mu_pa) * t1 + np.asarray(mu_lat) * t2) * var
    got_mu, got_lv = out["subsets"]["Lateral_PA"]
    np.testing.assert_allclose(np.asarray(got_mu), mu, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_lv), np.log(var), rtol=1e-4, atol=1e-5)


def test_missing_modality_subsets():
    """Conditional inference from a partial batch enumerates only the
    present modalities' powerset (VAEtrimodalMimic.encode :64-93)."""
    cfg = MopoeConfig(method="joint_elbo", **TINY)
    batch = _batch(cfg)
    partial = {"PA": batch["PA"], "text": batch["text"]}
    model, variables = _init(cfg, batch)
    out = model.apply(
        variables, partial, train=False, rngs={"reparam": jax.random.PRNGKey(3)},
        method=lambda m, b, train=False: m.inference(b, train=train),
    )
    assert set(out["subsets"].keys()) == {"PA", "text", "PA_text"}
    assert out["mus"].shape[0] == 3


@pytest.mark.parametrize("method", ["joint_elbo", "poe"])
def test_train_step_runs_and_improves(method):
    cfg = MopoeConfig(method=method, **TINY)
    ds = SyntheticMimic(cfg, seed=0)
    loader = BatchLoader(ds, cfg.batch_size, shuffle=True, seed=0)
    batch0 = next(iter(loader))[0]
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch0)
    step = make_train_step(cfg)
    losses = []
    for i, (batch, _label) in enumerate(loader):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
        if i >= 1:
            break
    assert all(np.isfinite(losses))
    assert not bool(metrics["nan_in_latents"])
    assert int(state.step) == 2
    # metrics carry per-subset KLDs + per-modality log-probs
    assert "Lateral_PA_text" in metrics["klds"] or method == "poe"
    assert set(metrics["log_probs"].keys()) == {"PA", "Lateral", "text"}


def test_generation_shapes():
    cfg = MopoeConfig(method="joint_elbo", **TINY)
    batch = _batch(cfg)
    model, variables = _init(cfg, batch)
    gen = model.apply(
        variables, 4, train=False, rngs={"reparam": jax.random.PRNGKey(5)},
        method=lambda m, n, train: m.generate(n, train=train),
    )
    assert gen["PA"].shape == (4, 64, 64, 1)
    assert gen["text"].shape[0] == 4
    # text mean is a probability simplex point
    s = float(gen["text"][0, 0].sum())
    assert abs(s - 1.0) < 1e-3
