"""Housekeeping: prune failed/short experiment dirs, stale classifier
dirs, and early checkpoints (parity: clean_experiment_checkpoints.py:1-131)."""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import List, Optional

import pandas as pd

from mopoe_mimic_tpu.utils.logger import log


def clean_failed_experiments(dir_experiment: str, min_epochs: int = 2) -> List[str]:
    """Delete run dirs whose CSV row is missing or that never got past
    min_epochs; drop their CSV rows."""
    root = Path(dir_experiment).expanduser()
    csv = root / "experiments_dataframe.csv"
    removed: List[str] = []
    df = pd.read_csv(csv) if csv.exists() else pd.DataFrame()
    known = set(df.get("str_experiment", pd.Series(dtype=str)).astype(str))
    for run in root.iterdir() if root.exists() else []:
        if not run.is_dir():
            continue
        name = run.name
        if name not in known:
            shutil.rmtree(run, ignore_errors=True)
            removed.append(name)
            continue
        row = df[df["str_experiment"] == name]
        epochs = row.get("total_epochs")
        if epochs is not None and not epochs.isna().all() and float(epochs.iloc[0]) < min_epochs:
            shutil.rmtree(run, ignore_errors=True)
            df = df[df["str_experiment"] != name]
            removed.append(name)
    if csv.exists():
        df.to_csv(csv, index=False)
    if removed:
        log.info(f"removed {len(removed)} stale experiment dirs")
    return removed


def clean_early_checkpoints(dir_experiment: str, keep_latest: int = 1) -> int:
    """Keep only the newest checkpoints of every run."""
    root = Path(dir_experiment).expanduser()
    n = 0
    for ckpt_dir in root.glob("*/checkpoints"):
        steps = sorted(
            (int(p.name) for p in ckpt_dir.iterdir() if p.name.isdigit()),
        )
        for s in steps[:-keep_latest]:
            shutil.rmtree(ckpt_dir / str(s), ignore_errors=True)
            n += 1
    return n


def main(argv=None) -> None:
    """Housekeeping CLI (parity: clean_experiment_checkpoints.py):

        python -m mopoe_mimic_tpu.utils.housekeeping \
            --dir_experiment ~/runs [--min_epochs 2] [--keep_latest 1] \
            [--skip_failed] [--skip_checkpoints]
    """
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir_experiment", required=True)
    p.add_argument("--min_epochs", type=int, default=2,
                   help="runs below this epoch count are deleted")
    p.add_argument("--keep_latest", type=int, default=1,
                   help="checkpoints kept per run")
    p.add_argument("--skip_failed", action="store_true",
                   help="do not delete failed/short experiment dirs")
    p.add_argument("--skip_checkpoints", action="store_true",
                   help="do not prune early checkpoints")
    args = p.parse_args(argv)
    if not args.skip_failed:
        clean_failed_experiments(args.dir_experiment, min_epochs=args.min_epochs)
    if not args.skip_checkpoints:
        clean_early_checkpoints(args.dir_experiment, keep_latest=args.keep_latest)


if __name__ == "__main__":
    main()
