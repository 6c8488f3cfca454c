"""CLI driver (parity: mimic/main_mimic.py:25-127).

Supervision policy:
  * NaN in latents → restart from scratch with a fresh seed, up to
    ``MAX_NAN_RESTARTS`` times, wiping the run dir + CSV row
    (main_mimic.py:39,79-114).
  * The reference's CUDA-OOM batch backoff (main_mimic.py:116-121) maps to
    compile-time RESOURCE_EXHAUSTED on TPU: batch_size × 0.8 and retry.

Usage:
    python -m mopoe_mimic_tpu.main --config_path configs/default.json \
        --dataset testing --end_epoch 2
"""

from __future__ import annotations

import shutil
import sys
import time

import numpy as np

try:  # persistent executable cache: recompiles are the dominant cold cost
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mopoe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # pragma: no cover
    pass

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.experiment import Experiment
from mopoe_mimic_tpu.train.loop import run_epochs
from mopoe_mimic_tpu.utils.exceptions import DeviceOutOfMemory, NaNInLatent
from mopoe_mimic_tpu.utils.logger import log

MAX_NAN_RESTARTS = 10


class Main:
    def __init__(self, cfg: MopoeConfig, run_name: str | None = None):
        self.cfg = cfg
        self.run_name = run_name  # reattach to this run dir (--load_run)
        self.restarts = 0

    def _run_once(self):
        exp = Experiment(self.cfg, name=self.run_name)
        self.last_run_dir = exp.paths.get("experiment_run", "")
        log.info(f"starting experiment {exp.name}")
        try:
            return run_epochs(
                exp,
                resume=bool(self.cfg.start_epoch) or self.run_name is not None,
            )
        except NaNInLatent:
            self._wipe(exp)
            raise
        finally:
            exp.tb_logger.close()
            if exp.checkpoints is not None:
                # shut orbax's async machinery down BEFORE interpreter
                # teardown — a live background executor at exit raises
                # "cannot schedule new futures after shutdown"
                exp.checkpoints.close()

    def _wipe(self, exp: Experiment) -> None:
        log.warning(f"wiping failed experiment dir {exp.paths['experiment_run']}")
        shutil.rmtree(exp.paths["experiment_run"], ignore_errors=True)
        if exp.experiments_df is not None:
            exp.experiments_df.delete_row()

    def main(self):
        t0 = time.time()
        while True:
            try:
                result = self._run_once()
                break
            except NaNInLatent as e:
                self.restarts += 1
                if self.restarts > MAX_NAN_RESTARTS:
                    log.error(f"giving up after {self.restarts} NaN restarts")
                    raise
                seed = int(np.random.default_rng().integers(0, 10000))
                log.warning(f"NaN in latents ({e}); restart {self.restarts} with seed {seed}")
                self.cfg = self.cfg.replace(seed=seed)
            except Exception as e:
                # XLA surfaces OOM as XlaRuntimeError(RESOURCE_EXHAUSTED),
                # not MemoryError — classify by content (train/autotune.py)
                from mopoe_mimic_tpu.train.autotune import is_oom_error

                if not is_oom_error(e):
                    raise
                new_bs = int(self.cfg.batch_size * 0.8)
                if new_bs < 8:
                    raise
                log.warning(f"device OOM; retrying with batch_size={new_bs}")
                self.cfg = self.cfg.replace(batch_size=new_bs)
        if result.get("preempted"):
            # resume must reattach to THIS run dir (--load_run): a bare
            # relaunch mints a fresh timestamped dir with no checkpoint in
            # it and silently starts over (ADVICE r3)
            log.warning(
                "run exited on a preemption notice (SIGTERM) with a saved "
                "checkpoint — resume with: "
                f"--load_run {getattr(self, 'last_run_dir', '<run_dir>')}"
            )
        log.info(f"experiment finished in {(time.time() - t0) / 60:.1f} min")
        return result


def load_flags(cfg: MopoeConfig, path: str, skip=()) -> MopoeConfig:
    """Overlay hyperparameters from a previous run's persisted config,
    keeping this run's paths (parity: --load_flags, flags.py:159-163).

    ``skip``: field names that must NOT be overlaid — the explicit CLI
    flags of the current invocation, so `--load_run X --end_epoch 200`
    extends a finished run instead of being silently reverted to the
    persisted end_epoch (ADVICE r3)."""
    import dataclasses
    import json

    with open(path) as f:
        old = json.load(f)
    known = {f.name for f in dataclasses.fields(MopoeConfig)}
    params = {
        k: v for k, v in old.items()
        if k in known and k not in skip and "dir" not in k and "path" not in k
    }
    return cfg.replace(**params)


def main(argv=None):
    import sys as _sys

    argv = list(argv if argv is not None else _sys.argv[1:])
    flags_path = None
    if "--load_flags" in argv:
        i = argv.index("--load_flags")
        flags_path = argv[i + 1]
        del argv[i : i + 2]
    run_dir = None
    if "--load_run" in argv:
        # resume an existing run directory after a restart/preemption:
        # reattach to its checkpoints and (unless --load_flags overrides)
        # its persisted config
        i = argv.index("--load_run")
        run_dir = argv[i + 1]
        del argv[i : i + 2]
    autotune = "--autotune_batch_size" in argv
    if autotune:
        argv.remove("--autotune_batch_size")
    # field names explicitly passed on THIS command line win over any
    # persisted config overlay below
    explicit_keys = {
        tok[2:].split("=", 1)[0] for tok in argv if tok.startswith("--")
    }
    cfg = MopoeConfig.from_cli(argv)
    run_name_arg = None
    if run_dir:
        import os

        run_dir = run_dir.rstrip("/")
        run_name_arg = os.path.basename(run_dir)
        parent = os.path.dirname(run_dir)
        if parent:
            cfg = cfg.replace(dir_experiment=parent)
        if flags_path is None:
            persisted = os.path.join(run_dir, "config.json")
            if os.path.exists(persisted):
                flags_path = persisted
    if flags_path:
        cfg = load_flags(cfg, flags_path, skip=explicit_keys)
    if cfg.seed is None:
        cfg = cfg.replace(seed=int(np.random.default_rng().integers(0, 10000)))
    if autotune:
        from mopoe_mimic_tpu.train.autotune import autotune_batch_size

        tuned = autotune_batch_size(cfg)
        if tuned != cfg.batch_size:
            log.info(f"autotuned batch_size {cfg.batch_size} → {tuned}")
            cfg = cfg.replace(batch_size=tuned)
    return Main(cfg, run_name=run_name_arg).main()


if __name__ == "__main__":
    main(sys.argv[1:])
