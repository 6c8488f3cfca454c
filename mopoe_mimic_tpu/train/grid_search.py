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


def main(argv=None) -> None:
    """Grid-search CLI (parity: networks/classifiers/grid_search.py:62-83):

        python -m mopoe_mimic_tpu.train.grid_search --dataset testing \
            --clf_modality PA \
            --grid '{"initial_learning_rate": [1e-4, 5e-4], "clf_loss": ["bce", "dice"]}'

    Every grid key is a config field; results append to --results_csv
    (the clf_experiments_dataframe.csv twin) sorted by mean AP."""
    import json

    from mopoe_mimic_tpu.experiment import Experiment

    p = MopoeConfig.parser()
    p.add_argument("--clf_modality", default="PA")
    p.add_argument("--grid", required=True,
                   help='JSON mapping of config field -> list of values')
    p.add_argument("--grid_max_epochs", type=int, default=10)
    p.add_argument("--results_csv", default="clf_experiments_dataframe.csv")
    args = p.parse_args(argv)
    cfg = MopoeConfig.from_namespace(args)
    exp = Experiment(cfg)
    df = grid_search_clf(
        cfg, args.clf_modality, exp.dataset_train, exp.dataset_test,
        n_labels=len(exp.labels), grid=json.loads(args.grid),
        results_csv=args.results_csv, max_epochs=args.grid_max_epochs,
    )
    log.info(f"best grid point:\n{df.head(1).to_string()}")


if __name__ == "__main__":
    main()
