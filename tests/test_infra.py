"""Host-side infra: results CSV, housekeeping, sample persistence, meters."""

import os

import numpy as np
import pandas as pd
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.utils.experiment_df import ExperimentDataframe
from mopoe_mimic_tpu.utils.housekeeping import clean_early_checkpoints, clean_failed_experiments
from mopoe_mimic_tpu.utils.meters import MetricAccumulator, flatten_metrics
from mopoe_mimic_tpu.utils.save_samples import (
    write_samples_img_to_file, write_samples_text_to_file,
)


def test_experiment_df_roundtrip(tmp_path):
    cfg = MopoeConfig(dataset="testing")
    csv = tmp_path / "experiments_dataframe.csv"
    df1 = ExperimentDataframe(str(csv), cfg, "run_a")
    df1.update({"total_test_loss": 1.5, "lr_eval": {"PA": {"accuracy": 0.9}}})
    df2 = ExperimentDataframe(str(csv), cfg, "run_b")
    loaded = pd.read_csv(csv)
    assert len(loaded) == 2
    row_a = loaded[loaded["str_experiment"] == "run_a"].iloc[0]
    assert row_a["total_test_loss"] == 1.5
    assert row_a["lr_eval_PA_accuracy"] == 0.9
    df1.delete_row()
    assert len(pd.read_csv(csv)) == 1


def test_experiment_df_reattach_reuses_row(tmp_path):
    """--load_run / preemption resume must NOT append a duplicate row
    (ADVICE r3): the reattached ExperimentDataframe reuses the existing
    row, refreshing config fields but keeping accumulated metrics."""
    cfg = MopoeConfig(dataset="testing", end_epoch=5)
    csv = tmp_path / "experiments_dataframe.csv"
    df1 = ExperimentDataframe(str(csv), cfg, "run_a")
    df1.update({"total_test_loss": 1.5})
    # resume with an extended end_epoch (CLI override on reattach)
    ExperimentDataframe(str(csv), cfg.replace(end_epoch=10), "run_a")
    loaded = pd.read_csv(csv)
    assert len(loaded) == 1
    assert loaded.iloc[0]["end_epoch"] == 10  # config refreshed
    assert loaded.iloc[0]["total_test_loss"] == 1.5  # metrics kept
    # and update() after reattach touches exactly that one row
    ExperimentDataframe(str(csv), cfg, "run_b").update({"total_test_loss": 9.0})
    loaded = pd.read_csv(csv)
    assert len(loaded) == 2
    assert loaded[loaded["str_experiment"] == "run_a"].iloc[0]["total_test_loss"] == 1.5


def test_load_flags_cli_wins():
    """Explicit CLI flags survive a --load_run config overlay (ADVICE r3)."""
    import json

    from mopoe_mimic_tpu.main import load_flags

    cfg = MopoeConfig(dataset="testing", end_epoch=200, batch_size=16)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump({"end_epoch": 100, "batch_size": 64, "beta": 2.5}, f)
        path = f.name
    merged = load_flags(cfg, path, skip={"end_epoch"})
    assert merged.end_epoch == 200  # explicit CLI flag wins
    assert merged.batch_size == 64  # non-explicit: persisted value applies
    assert merged.beta == 2.5
    os.unlink(path)


def test_housekeeping(tmp_path):
    # run with a CSV row and enough epochs survives; unknown dir is removed
    cfg = MopoeConfig(dataset="testing", dir_experiment=str(tmp_path))
    ExperimentDataframe(str(tmp_path / "experiments_dataframe.csv"), cfg, "keeper").update(
        {"total_epochs": 10}
    )
    (tmp_path / "keeper").mkdir()
    (tmp_path / "orphan").mkdir()
    removed = clean_failed_experiments(str(tmp_path), min_epochs=2)
    assert "orphan" in removed and not (tmp_path / "orphan").exists()
    assert (tmp_path / "keeper").exists()
    # early checkpoint pruning
    ck = tmp_path / "keeper" / "checkpoints"
    for step in ("1", "5", "9"):
        (ck / step).mkdir(parents=True)
    n = clean_early_checkpoints(str(tmp_path), keep_latest=1)
    assert n == 2 and (ck / "9").exists() and not (ck / "1").exists()


def test_save_samples(tmp_path):
    imgs = np.random.default_rng(0).random((4, 8, 8, 1)).astype(np.float32)
    fn = tmp_path / "grid.png"
    write_samples_img_to_file(imgs, str(fn))
    assert fn.exists() and fn.stat().st_size > 0
    txt = tmp_path / "samples.txt"
    write_samples_text_to_file([["h", "i", "&", "&"], ["y", "o"]], str(txt))
    assert txt.read_text() == "hi\nyo\n"


def test_metric_accumulator_means():
    acc = MetricAccumulator()
    acc.update({"a": np.float32(1.0), "b": {"c": np.float32(2.0)}})
    acc.update({"a": np.float32(3.0), "b": {"c": np.float32(4.0)}})
    avg = acc.averages()
    assert avg["a"] == 2.0 and avg["b"]["c"] == 3.0  # true means, not last value
    flat = flatten_metrics(avg)
    assert flat == {"a": 2.0, "b/c": 3.0}


def test_fetch_scalar_tree_two_rpc_path_and_fallback():
    """fetch_scalar_tree collapses a scalar pytree into one stacked
    fetch (per-leaf device_get RPCs cost tens of ms each through a thin
    link — BENCH.md round-3) and preserves structure/values exactly;
    non-scalar leaves fall back to plain device_get."""
    import jax.numpy as jnp

    from mopoe_mimic_tpu.utils.meters import fetch_scalar_tree

    tree = {
        "a": jnp.float32(1.5),
        "b": {"c": jnp.float32(-2.0), "d": (jnp.float32(3.0), jnp.bool_(True))},
    }
    out = fetch_scalar_tree(tree)
    assert out == {"a": 1.5, "b": {"c": -2.0, "d": (3.0, 1.0)}}
    assert all(isinstance(x, float) for x in (out["a"], out["b"]["c"]))

    # fallback: vector leaf → device_get semantics, dtype preserved
    mixed = {"v": jnp.arange(3, dtype=jnp.int32), "s": jnp.float32(4.0)}
    out2 = fetch_scalar_tree(mixed)
    np.testing.assert_array_equal(out2["v"], np.arange(3, dtype=np.int32))
    assert float(out2["s"]) == 4.0
