"""Batch autotune + OOM classification (TPU-native analog of the
reference's CUDA-OOM retry, main_mimic.py:116-121)."""

import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.train.autotune import (
    autotune_batch_size, is_oom_error, step_memory_bytes,
)
from mopoe_mimic_tpu.utils.exceptions import DeviceOutOfMemory


def test_is_oom_error_classification():
    assert is_oom_error(MemoryError())
    assert is_oom_error(DeviceOutOfMemory("x"))
    assert is_oom_error(RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating"))
    assert is_oom_error(Exception("XLA allocation failure: Out of memory"))
    assert not is_oom_error(ValueError("shape mismatch"))
    assert not is_oom_error(RuntimeError("NaN in latents"))


def _cfg(bs=8):
    return MopoeConfig(
        method="joint_elbo", dataset="testing", img_size=64, DIM_img=2,
        DIM_text=2, class_dim=4, text_encoding="word", vocab_size=50,
        batch_size=bs, compute_dtype="float32",
    )


def test_autotune_doubles_until_budget():
    # fake probe: 1 MiB per sample; 100 MiB budget → best batch = 64
    probe = lambda cfg: cfg.batch_size * 2**20
    best = autotune_batch_size(
        _cfg(8), max_batch=4096, budget_fraction=1.0,
        memory_bytes=100 * 2**20, probe_fn=probe,
    )
    assert best == 64


def test_autotune_stops_at_compile_oom():
    def probe(cfg):
        if cfg.batch_size > 16:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return cfg.batch_size

    best = autotune_batch_size(
        _cfg(8), budget_fraction=1.0, memory_bytes=10**9, probe_fn=probe,
    )
    assert best == 16


def test_autotune_raises_when_nothing_fits():
    with pytest.raises(DeviceOutOfMemory):
        autotune_batch_size(
            _cfg(8), budget_fraction=1.0, memory_bytes=4,
            probe_fn=lambda cfg: 10**9,
        )


def test_autotune_keeps_batch_without_memory_info():
    assert autotune_batch_size(_cfg(8), memory_bytes=None,
                               probe_fn=lambda c: 0) == 8


@pytest.mark.slow
def test_step_memory_bytes_real_compile():
    """The AOT probe compiles the real train step and reports nonzero
    planned bytes (CPU backend supports memory_analysis)."""
    planned = step_memory_bytes(_cfg(8))
    assert planned > 2**20  # at least the model + batch
