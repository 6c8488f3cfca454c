import pytest
"""Exploration toolkit (examples/explore.py — script-form parity for the
reference's mimic/notebooks/: data visualization + model exploration)."""

import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.train.state import create_train_state
from mopoe_mimic_tpu.utils.checkpoints import CheckpointManager

import explore  # noqa: E402


def _cfg(tmp_path, **kw):
    base = dict(
        method="joint_elbo", dataset="testing_structured", batch_size=4,
        class_dim=4, DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=30, compute_dtype="float32",
        dir_experiment=str(tmp_path / "runs"),
    )
    base.update(kw)
    return MopoeConfig(**base)


def _fake_run_dir(tmp_path, cfg):
    """A deployable run directory without training: config.json + one
    checkpoint of a freshly initialized state (what explore/serve need)."""
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    with open(run_dir / "config.json", "w") as f:
        json.dump(cfg.to_dict(), f, default=str)
    ds = SyntheticMimic(cfg, seed=0)
    batch, _ = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    mgr = CheckpointManager(str(run_dir / "checkpoints"))
    mgr.save(0, state, metrics={"test_loss": 1.0}, force=True)
    mgr.close()
    return str(run_dir)


def test_explore_data_writes_grids_and_stats(tmp_path):
    cfg = _cfg(tmp_path)
    out = tmp_path / "data_vis"
    wrote = explore.explore_data(cfg, str(out), n=8)
    assert set(wrote) >= {"PA", "Lateral", "text", "labels"}
    assert (out / "PA_grid.png").stat().st_size > 0
    assert (out / "text_samples.txt").stat().st_size > 0
    with open(out / "text_length_stats.json") as f:
        stats = json.load(f)
    assert 0 < stats["mean"] <= cfg.len_sequence
    # label CSV has one row per label + header
    lines = (out / "label_distribution.csv").read_text().strip().splitlines()
    assert len(lines) == 4  # header + 3 CheXpert labels


@pytest.mark.slow  # >30s on the 1-core box; excluded from the fast gate
def test_explore_model_writes_all_artifacts(tmp_path):
    cfg = _cfg(tmp_path)
    run_dir = _fake_run_dir(tmp_path, cfg)
    out = tmp_path / "model_vis"
    wrote = explore.explore_model(run_dir, str(out), num_samples=4,
                                  traverse_dims=2)
    assert {"gen_PA", "gen_text", "recon_PA", "traversal_PA",
            "posterior_stats"} <= set(wrote)
    # traversal sheet: traverse_dims rows × 9 steps of img_size tiles
    from PIL import Image

    img = Image.open(out / "traversal_PA.png")
    assert img.size[0] >= 9 * 64 and img.size[1] >= 2 * 64
    rows = (out / "posterior_stats.csv").read_text().strip().splitlines()
    assert len(rows) == 8  # header + 7 subsets
    # CLI entry parses too
    explore.main(["data", "--config", os.path.join(run_dir, "config.json"),
                  "--out", str(tmp_path / "cli_vis"), "--n", "4"])
    assert (tmp_path / "cli_vis" / "label_distribution.csv").exists()
