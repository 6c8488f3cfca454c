"""Native C++ host codec equals the numpy reference implementation."""

import numpy as np
import pytest

from mopoe_mimic_tpu.data.text_codec import one_hot_encode
from mopoe_mimic_tpu.native import fast_codec


def test_native_one_hot_matches_python():
    texts = ["there is no focal consolidation.", "ab", "", "x" * 2000, "naïve café"]
    len_seq = 64
    got = fast_codec.one_hot_encode_batch(texts, len_seq)
    want = np.stack([one_hot_encode(len_seq, t.lower()) for t in texts])
    assert got.shape == want.shape == (5, 64, 71)
    if fast_codec.have_native():
        np.testing.assert_array_equal(got, want)
    else:
        pytest.skip("no compiler; fallback path identical by construction")


def test_native_gather_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.random((50, 8, 8, 1), dtype=np.float32)
    idx = np.array([3, 49, 0, 7], dtype=np.int64)
    got = fast_codec.gather_rows_f32(src, idx)
    np.testing.assert_array_equal(got, src[idx])


def test_native_throughput_sanity():
    # batch-64 × 1024 × 71 one-hot should be far under a second natively
    import time

    texts = ["the quick brown fox jumps over the lazy dog. " * 20] * 64
    t0 = time.perf_counter()
    out = fast_codec.one_hot_encode_batch(texts, 1024)
    dt = time.perf_counter() - t0
    assert out.shape == (64, 1024, 71)
    assert out.sum() == 64 * 1024  # exactly one hot per position
    if fast_codec.have_native():
        assert dt < 1.0
