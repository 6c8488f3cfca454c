import numpy as np

from mopoe_mimic_tpu.parallel.mesh import make_mesh
from mopoe_mimic_tpu.parallel.prefetch import prefetch_to_device


import pytest


@pytest.mark.parametrize("threaded", [False, True])
def test_prefetch_preserves_order_and_places_on_device(threaded):
    mesh = make_mesh()
    batches = [({"x": np.full((8, 2), i, np.float32)}, np.full((8,), i)) for i in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh, size=2, threaded=threaded))
    assert len(out) == 5
    for i, (batch, labels) in enumerate(out):
        assert float(np.asarray(batch["x"])[0, 0]) == i
        assert labels[0] == i
        assert hasattr(batch["x"], "sharding")


@pytest.mark.parametrize("threaded", [False, True])
def test_prefetch_empty_iterator(threaded):
    mesh = make_mesh()
    assert list(prefetch_to_device(iter([]), mesh, threaded=threaded)) == []


def test_prefetch_threaded_propagates_producer_exception():
    mesh = make_mesh()

    def bad():
        yield {"x": np.zeros((8, 2), np.float32)}, np.zeros((8,))
        raise ValueError("loader broke")

    it = prefetch_to_device(bad(), mesh, size=2, threaded=True)
    next(it)
    with pytest.raises(ValueError, match="loader broke"):
        list(it)


def test_prefetch_threaded_early_break_stops_producer():
    """Abandoning the generator (steps_per_training_epoch cap) must not leave
    the producer thread spinning or the source iterator draining forever."""
    import itertools
    import threading

    mesh = make_mesh()
    pulled = []

    def source():
        for i in itertools.count():
            pulled.append(i)
            yield {"x": np.full((8, 2), i, np.float32)}, np.full((8,), i)

    before = threading.active_count()
    gen = prefetch_to_device(source(), mesh, size=2, threaded=True)
    for _ in range(3):
        next(gen)
    gen.close()
    # bounded queue: producer can be at most a few batches ahead
    assert len(pulled) <= 3 + 4
    # producer thread exits once the stop flag is observed
    for _ in range(50):
        if threading.active_count() <= before:
            break
        import time

        time.sleep(0.05)
    assert threading.active_count() <= before


def test_quantize_batch_uint8_roundtrip():
    from mopoe_mimic_tpu.parallel.prefetch import quantize_batch_uint8

    rng = np.random.default_rng(0)
    batch = {
        "PA": rng.random((4, 8, 8, 1)).astype(np.float32),
        "onehot": np.eye(5, dtype=np.float32)[rng.integers(0, 5, (4, 7))],
        "ids": rng.integers(0, 50, (4, 7)).astype(np.int32),
    }
    q = quantize_batch_uint8(batch)
    assert q["PA"].dtype == np.uint8 and q["onehot"].dtype == np.uint8
    assert q["ids"] is batch["ids"]  # integer ids untouched
    # dequantization contract of train/step.py
    deq = q["PA"].astype(np.float32) / 255.0
    assert np.abs(deq - batch["PA"]).max() <= 0.5 / 255 + 1e-7
    np.testing.assert_array_equal(q["onehot"].astype(np.float32) / 255.0,
                                  batch["onehot"])  # {0,1} is lossless


@pytest.mark.slow  # >30s on the 1-core box; excluded from the fast gate
def test_train_step_accepts_uint8_batch():
    """transfer_uint8 end-to-end: the jitted step dequantizes on device and
    produces a loss close to the float-fed step."""
    import jax

    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.parallel.prefetch import quantize_batch_uint8
    from mopoe_mimic_tpu.train import create_train_state, make_train_step

    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", batch_size=8, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=50, compute_dtype="float32", seed=2,
    )
    ds = SyntheticMimic(cfg, seed=0)
    batch, _ = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    _, m_float = step(state, batch)
    _, m_uint8 = step(state, quantize_batch_uint8(batch))
    lf, lu = float(m_float["total_loss"]), float(m_uint8["total_loss"])
    assert np.isfinite(lu)
    assert abs(lf - lu) / abs(lf) < 5e-3, (lf, lu)
