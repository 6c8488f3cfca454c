"""Classifier hyperparameter grid search (parity:
mimic/networks/classifiers/grid_search.py:62-83 — sklearn ParameterGrid
over the classifier training knobs, results appended to a CSV)."""

from __future__ import annotations

import itertools
from pathlib import Path
from typing import Any, Dict, Iterable, List, Mapping, Sequence

import pandas as pd

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.train.clf_trainer import train_classifier
from mopoe_mimic_tpu.utils.logger import log


def parameter_grid(grid: Mapping[str, Sequence[Any]]) -> Iterable[Dict[str, Any]]:
    keys = sorted(grid)
    for combo in itertools.product(*(grid[k] for k in keys)):
        yield dict(zip(keys, combo))


def grid_search_clf(
    base_cfg: MopoeConfig,
    modality: str,
    dataset_train,
    dataset_eval,
    n_labels: int,
    grid: Mapping[str, Sequence[Any]],
    results_csv: str = "clf_experiments_dataframe.csv",
    max_epochs: int = 10,
) -> pd.DataFrame:
    """Train one classifier per grid point; returns (and persists) the
    results table sorted by mean AP."""
    rows: List[Dict[str, Any]] = []
    for params in parameter_grid(grid):
        cfg = base_cfg.replace(**params)
        log.info(f"grid point: {params}")
        _, results = train_classifier(
            cfg, modality, dataset_train, dataset_eval, n_labels,
            max_epochs=max_epochs,
        )
        rows.append({**params, **results, "modality": modality})
    df = pd.DataFrame(rows)
    path = Path(results_csv)
    if path.exists():
        df = pd.concat([pd.read_csv(path), df], ignore_index=True)
    df.to_csv(path, index=False)
    sort_key = "mean_AP_total" if "mean_AP_total" in df else "dice"
    return df.sort_values(sort_key, ascending=False)
