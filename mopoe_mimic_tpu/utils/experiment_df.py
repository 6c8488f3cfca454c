"""Cumulative results CSV — one row per experiment, all config fields +
flattened test metrics, updated after every test epoch (parity:
mimic/utils/experiment.py:227-260 `experiments_dataframe.csv`)."""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Mapping

import pandas as pd

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.utils.meters import flatten_metrics


class ExperimentDataframe:
    def __init__(self, path: str, cfg: MopoeConfig, run_name: str):
        self.path = Path(path)
        self.run_name = run_name
        row: Dict[str, Any] = {"str_experiment": run_name}
        row.update({k: str(v) if isinstance(v, (list, tuple, dict)) else v
                    for k, v in cfg.to_dict().items()})
        df = self._load()
        if len(df) and "str_experiment" in df.columns and \
                (df["str_experiment"] == run_name).any():
            # reattach (--load_run / preemption resume): reuse the existing
            # row — refresh its config fields, keep accumulated metrics —
            # instead of appending a duplicate that update()/delete_row()
            # would then mutate en masse (ADVICE r3). Collapse any legacy
            # duplicates to the first occurrence.
            df = df[~df["str_experiment"].duplicated() |
                    (df["str_experiment"] != run_name)].reset_index(drop=True)
            mask = df["str_experiment"] == run_name
            for k, v in row.items():
                if k not in df.columns:
                    df[k] = pd.Series([None] * len(df), dtype="object") \
                        if isinstance(v, str) else float("nan")
                elif isinstance(v, str) and df[k].dtype != object:
                    df[k] = df[k].astype(object)
                df.loc[mask, k] = v
        else:
            df = pd.concat([df, pd.DataFrame([row])], ignore_index=True)
        self._write(df)

    def _load(self) -> pd.DataFrame:
        if self.path.exists():
            return pd.read_csv(self.path)
        return pd.DataFrame()

    def _write(self, df: pd.DataFrame) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        df.to_csv(self.path, index=False)

    def update(self, values: Mapping[str, Any]) -> None:
        """Flatten and merge metric values into this experiment's row."""
        flat = flatten_metrics(dict(values), sep="_")
        df = self._load()
        mask = df["str_experiment"] == self.run_name
        # add all missing columns in ONE concat (inserting hundreds of
        # eval columns one-by-one fragments the frame — pandas
        # PerformanceWarning, and a real slowdown at the 292-col scale)
        missing = [k for k in flat if k not in df.columns]
        if missing:
            new_cols = pd.DataFrame({
                k: pd.Series([None] * len(df), dtype="object")
                if isinstance(flat[k], str) else
                pd.Series([float("nan")] * len(df))
                for k in missing
            })
            df = pd.concat([df, new_cols], axis=1)
        for k, v in flat.items():
            if isinstance(v, str) and df[k].dtype != object:
                df[k] = df[k].astype(object)
            df.loc[mask, k] = v
        self._write(df)

    def delete_row(self) -> None:
        """Drop this experiment (restart semantics, main_mimic.py:79-98)."""
        df = self._load()
        df = df[df["str_experiment"] != self.run_name]
        self._write(df)
