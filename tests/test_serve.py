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
    return MopoeConfig(
        method="joint_elbo", dataset="testing", batch_size=4, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=30, compute_dtype="float32", **kw,
    )


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
