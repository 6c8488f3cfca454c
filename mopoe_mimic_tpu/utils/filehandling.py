"""Run-directory layout (parity: mimic/utils/filehandling.py:12-89).

Creates the per-run tree the reference tooling expects: checkpoints/,
logs/, generation_evaluation/, inference/, fid/, plots/{random_samples,
cond_gen,swapping}."""

from __future__ import annotations

import datetime
import os
from pathlib import Path
from typing import Dict

from mopoe_mimic_tpu.config import MopoeConfig


def run_name(cfg: MopoeConfig) -> str:
    stamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S_%f")
    return f"{cfg.exp_str_prefix}_{cfg.method}_{stamp}"


def create_dir_structure(cfg: MopoeConfig, name: str = "", train: bool = True) -> Dict[str, str]:
    """Returns the path map; mkdir -p everything under dir_experiment."""
    name = name or run_name(cfg)
    root = Path(cfg.dir_experiment).expanduser() / name
    paths = {
        "experiment_run": str(root),
        "checkpoints": str(root / "checkpoints"),
        "logs": str(root / "logs"),
        "gen_eval": str(root / "generation_evaluation"),
        "inference": str(root / "inference"),
        "fid": str(cfg.dir_fid or root / "fid"),
        "plots": str(root / "plots"),
        "plot_random": str(root / "plots" / "random_samples"),
        "plot_cond": str(root / "plots" / "cond_gen"),
        "plot_swap": str(root / "plots" / "swapping"),
    }
    if train:
        for p in paths.values():
            os.makedirs(p, exist_ok=True)
    return paths
