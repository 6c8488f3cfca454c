"""Serving surface: InferenceSession bucketing, endpoints, and
checkpoint restore (mopoe_mimic_tpu/serve.py — no reference counterpart;
deployment path on top of the orbax checkpoints)."""

import jax
import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.serve import InferenceSession
from mopoe_mimic_tpu.train.state import create_train_state


def _cfg(**kw):
    base = dict(
        method="joint_elbo", dataset="testing", batch_size=4, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=30, compute_dtype="float32",
    )
    base.update(kw)
    return MopoeConfig(**base)


@pytest.fixture(scope="module")
def session():
    cfg = _cfg()
    ds = SyntheticMimic(cfg, seed=0)
    batch, _ = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    return InferenceSession(cfg=cfg, state=state, buckets=(2, 4)), batch


def test_generate_chunks_across_buckets(session):
    sess, _ = session
    out = sess.generate(num_samples=5, seed=1)  # 4 + 1 → buckets 4, 2
    assert set(out) == {"PA", "Lateral", "text"}
    assert out["PA"].shape == (5, 64, 64, 1)
    assert out["text"].shape[0] == 5
    # text means are probabilities over the vocab
    np.testing.assert_allclose(out["text"].sum(-1), 1.0, atol=1e-3)
    # distinct seeds → distinct samples
    out2 = sess.generate(num_samples=5, seed=2)
    assert np.abs(out["PA"] - out2["PA"]).max() > 0


def test_compact_wire_matches_full(session):
    """compact=True = on-device argmax text ids + uint8 images; must be
    the argmax / 255-quantization of the full-precision outputs for the
    same seed, and decode_text must accept the id form."""
    sess, _ = session
    full = sess.generate(num_samples=4, seed=3)
    compact = sess.generate(num_samples=4, seed=3, compact=True)
    assert compact["text"].dtype == np.int32
    np.testing.assert_array_equal(
        compact["text"], np.argmax(full["text"], axis=-1))
    for m in ("PA", "Lateral"):
        assert compact[m].dtype == np.uint8
        want = np.clip(full[m] * 255.0 + 0.5, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(compact[m], want)
    # cond_generate honors the same wire format
    cg = sess.cond_generate(
        {k: v[:2] for k, v in session[1].items()}, seed=1, compact=True)
    any_subset = next(iter(cg.values()))
    assert any_subset["text"].dtype == np.int32
    assert any_subset["PA"].dtype == np.uint8


def test_encode_pads_and_slices(session):
    sess, batch = session
    small = {k: np.asarray(v)[:3] for k, v in batch.items()}  # pads to 4
    lat = sess.encode(small)
    assert set(lat) == {"subsets", "joint"}
    mu, lv = lat["joint"]
    assert mu.shape == (3, 4) and lv.shape == (3, 4)
    assert set(lat["subsets"]) == {
        "PA", "Lateral", "text", "Lateral_PA", "PA_text", "Lateral_text",
        "Lateral_PA_text",
    }
    # padding must not leak: encoding the full batch gives identical rows
    full = sess.encode({k: np.asarray(v) for k, v in batch.items()})
    np.testing.assert_allclose(full["joint"][0][:3], mu, atol=1e-5)


def test_cond_generate_all_subsets(session):
    sess, batch = session
    out = sess.cond_generate({k: np.asarray(v)[:2] for k, v in batch.items()})
    assert len(out) == 7
    assert out["PA_text"]["Lateral"].shape == (2, 64, 64, 1)


def test_session_restores_from_checkpoint(tmp_path, session):
    sess, batch = session
    cfg = sess.cfg

    from mopoe_mimic_tpu.train.state import TrainState  # noqa: F401
    from mopoe_mimic_tpu.utils.checkpoints import CheckpointManager

    state = TrainState(
        params=sess.params, batch_stats=sess.batch_stats,
        opt_state=create_train_state(
            cfg, jax.random.PRNGKey(0), batch).opt_state,
        step=jax.numpy.ones((), jax.numpy.int32),
        rng=jax.random.PRNGKey(9),
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, state, metrics={"test_loss": 1.0}, force=True)
    mgr.close()

    restored = InferenceSession(
        cfg=cfg, checkpoint_dir=str(tmp_path / "ckpt"), buckets=(2, 4))
    assert restored.epoch == 3
    a = restored.generate(2, seed=0)
    b = sess.generate(2, seed=0)
    np.testing.assert_allclose(a["PA"], b["PA"], atol=1e-6)


@pytest.mark.slow
def test_serve_cli_end_to_end(tmp_path):
    """Train a tiny run with checkpoints, then drive the serve CLI on the
    run directory: restores weights and writes sample artifacts."""
    import os

    from mopoe_mimic_tpu import serve
    from mopoe_mimic_tpu.experiment import Experiment
    from mopoe_mimic_tpu.train.loop import run_epochs

    cfg = _cfg(
        end_epoch=1, steps_per_training_epoch=2, eval_freq=100,
        dir_experiment=str(tmp_path), checkpoint_freq=1, batch_size=8,
    )
    exp = Experiment(cfg)
    run_epochs(exp)
    run_dir = exp.paths["experiment_run"]
    assert os.path.exists(os.path.join(run_dir, "config.json"))

    serve.main([
        "--run_dir", run_dir, "--num_samples", "4",
        "--out", str(tmp_path / "samples"),
    ])
    wrote = os.listdir(tmp_path / "samples")
    assert "text_probs.npy" in wrote
    assert any(f.startswith("PA.") for f in wrote)

    serve.main([
        "--run_dir", run_dir, "--num_samples", "4", "--compact",
        "--out", str(tmp_path / "samples_compact"),
    ])
    wrote = os.listdir(tmp_path / "samples_compact")
    assert "text_ids.npy" in wrote
    import numpy as np
    assert np.load(tmp_path / "samples_compact" / "text_ids.npy").dtype == np.int32
    assert any(f.startswith("PA.") for f in wrote)


def test_text_array_and_decode_char(session):
    sess, _ = session
    char_sess = InferenceSession(
        cfg=sess.cfg.replace(text_encoding="char"), state=_char_state(),
        buckets=(2,),
    )
    arr = char_sess.text_array(["no acute findings", "clear lungs"])
    assert arr.shape == (2, 1024, 71)
    decoded = char_sess.decode_text(arr)
    assert decoded[0].startswith("no acute findings$")  # EOS then padding
    assert decoded[1].startswith("clear lungs$")


def _char_state():
    cfg = _cfg(text_encoding="char")
    ds = SyntheticMimic(cfg, seed=0)
    batch, _ = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))
    return create_train_state(cfg, jax.random.PRNGKey(0), batch)


def test_export_roundtrip_matches_live_session(tmp_path, session):
    # jax.export artifacts: weights baked in, loadable WITHOUT model code,
    # outputs identical to the live jitted endpoints
    from mopoe_mimic_tpu.serve import load_exported

    sess, batch = session
    out_dir = str(tmp_path / "artifacts")
    paths = sess.export(out_dir, bucket=2, platforms=("cpu",))
    assert set(paths) == {"generate", "encode", "cond_generate"}

    fns, manifest = load_exported(out_dir)
    assert manifest["bucket"] == 2

    # the live endpoint derives its key as fold_in(PRNGKey(seed), chunk)
    # inside the jitted program; feed the artifact the same key
    key = np.asarray(jax.random.fold_in(jax.random.PRNGKey(7), 0), np.uint32)
    live = sess._fn("generate", 2)(sess.params, sess.batch_stats, 7, 0)
    art = fns["generate"](key)
    for m in live:
        np.testing.assert_allclose(np.asarray(art[m]), np.asarray(live[m]),
                                   rtol=1e-5, atol=1e-5)

    small = {k: np.asarray(v)[:2] for k, v in batch.items()}
    small = {k: (v.astype(np.int32) if k == "text" else v.astype(np.float32))
             for k, v in small.items()}
    live_enc = sess._fn("encode", 2)(sess.params, sess.batch_stats, small)
    art_enc = fns["encode"](small)
    np.testing.assert_allclose(np.asarray(art_enc["joint"][0]),
                               np.asarray(live_enc["joint"][0]),
                               rtol=1e-5, atol=1e-5)


def test_requests_larger_than_biggest_bucket(session):
    """Requests beyond the largest bucket split into multiple chunks."""
    sess, batch = session
    out = sess.generate(num_samples=11, seed=0)  # buckets (2,4) → 4+4+2+1
    assert out["PA"].shape[0] == 11
    big = {k: np.repeat(np.asarray(v), 3, axis=0) for k, v in batch.items()}  # 12 rows
    lat = sess.encode(big)
    assert lat["joint"][0].shape[0] == 12


def test_text_array_word_uses_persisted_vocab(tmp_path, session):
    """Word-mode text_array encodes via the vocabulary persisted next to
    the training data (cfg.dir_data)."""
    from mopoe_mimic_tpu.data.vocab import Vocab

    sess, _ = session
    cfg = sess.cfg  # word mode
    base = tmp_path / f"files_small_{cfg.img_size}"
    base.mkdir(parents=True)
    vocab = Vocab.build(
        ["no acute findings", "no pleural effusion", "acute findings noted"],
        min_occ=0,
    )
    vocab.save(str(base), cfg.word_min_occ, cfg.len_sequence)

    word_sess = InferenceSession(
        cfg=cfg.replace(dir_data=str(tmp_path)), state=_char_state_like(cfg),
        buckets=(2,),
    )
    ids = word_sess.text_array(["no acute findings", "unseen words here"])
    assert ids.shape == (2, cfg.len_sequence) and ids.dtype == np.int32
    # decode round-trips through the same vocab
    toks = word_sess.decode_text(
        np.eye(vocab.vocab_size, dtype=np.float32)[ids], i2w=vocab.i2w)
    assert toks[0][:3] == ["no", "acute", "findings"]


def _char_state_like(cfg):
    ds = SyntheticMimic(cfg, seed=0)
    batch, _ = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))
    return create_train_state(cfg, jax.random.PRNGKey(0), batch)
