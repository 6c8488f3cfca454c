"""The standalone workload CLIs (parity with the reference's auxiliary
entry points): classifier training (main_train_clf_mimic.py), grid search
(classifiers/grid_search.py), checkpoint housekeeping
(clean_experiment_checkpoints.py)."""

import json
import os
import tempfile

import pytest


def _base_args(d, c):
    return [
        "--dataset", "testing", "--img_size", "64", "--DIM_img", "4",
        "--DIM_text", "4", "--class_dim", "8", "--text_encoding", "word",
        "--vocab_size", "60", "--batch_size", "4", "--synthetic_length", "8",
        "--clf_quick_epochs", "1", "--compute_dtype", "float32",
        "--dir_experiment", d, "--dir_clf", c,
    ]


@pytest.mark.slow
def test_clf_trainer_cli_trains_and_caches_all_modalities(tmp_path):
    from mopoe_mimic_tpu.train.clf_trainer import main as clf_main

    d, c = str(tmp_path / "runs"), str(tmp_path / "clf")
    clf_main(_base_args(d, c))
    # one orbax checkpoint dir per modality under the dataset fingerprint
    fingerprints = list((tmp_path / "clf" / "testing").iterdir())
    assert fingerprints, "no classifier cache written"
    names = {p.name for p in fingerprints[0].iterdir()}
    assert {"PA", "Lateral", "text"} <= {n.split("_")[0] for n in names} or names


@pytest.mark.slow
def test_grid_search_cli_appends_results_csv(tmp_path, monkeypatch):
    from mopoe_mimic_tpu.train.grid_search import main as gs_main

    d, c = str(tmp_path / "runs"), str(tmp_path / "clf")
    monkeypatch.chdir(tmp_path)
    gs_main(_base_args(d, c) + [
        "--clf_modality", "text",
        "--grid", json.dumps({"initial_learning_rate": [1e-3]}),
        "--grid_max_epochs", "1",
        "--results_csv", str(tmp_path / "grid.csv"),
    ])
    import pandas as pd

    df = pd.read_csv(tmp_path / "grid.csv")
    assert len(df) == 1 and "initial_learning_rate" in df.columns


def test_housekeeping_cli_removes_unknown_run_dirs(tmp_path):
    from mopoe_mimic_tpu.utils.housekeeping import main as hk_main

    root = tmp_path / "exps"
    (root / "stale_run").mkdir(parents=True)
    hk_main(["--dir_experiment", str(root)])
    assert not (root / "stale_run").exists()


def test_from_namespace_matches_from_cli():
    from mopoe_mimic_tpu.config import MopoeConfig

    argv = ["--dataset", "testing", "--batch_size", "6", "--use_clf", "true"]
    via_cli = MopoeConfig.from_cli(argv)
    ns = MopoeConfig.parser().parse_args(argv)
    assert MopoeConfig.from_namespace(ns) == via_cli
    # extended parsers: extra non-config flags are ignored by the config
    p = MopoeConfig.parser()
    p.add_argument("--grid", default=None)
    ns2 = p.parse_args(argv + ["--grid", "{}"])
    assert MopoeConfig.from_namespace(ns2) == via_cli
