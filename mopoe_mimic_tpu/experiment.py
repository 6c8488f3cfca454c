"""Experiment container: wires config → data → model → optimizer → sinks.

Parity: MimicExperiment (mimic/utils/experiment.py:40-283) — datasets,
modality set, subset powerset, model, optimizer, rec/style weight dicts,
results-CSV row, run-dir tree — minus torch-specific plumbing. Evaluation
classifiers are loaded lazily by the eval suite.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.models.mmvae import MMVae
from mopoe_mimic_tpu.ops.fusion import subset_powerset
from mopoe_mimic_tpu.train.state import TrainState, create_train_state, make_optimizer
from mopoe_mimic_tpu.utils.checkpoints import CheckpointManager
from mopoe_mimic_tpu.utils.experiment_df import ExperimentDataframe
from mopoe_mimic_tpu.utils.filehandling import create_dir_structure, run_name
from mopoe_mimic_tpu.utils.logger import log
from mopoe_mimic_tpu.utils.tb_logger import TBLogger


# CheXpert labels used for evaluation (dataio/utils.py:183-187)
LABELS = ["Lung Opacity", "Pleural Effusion", "Support Devices"]
BINARY_LABELS = ["Finding"]


class Experiment:
    def __init__(self, cfg: MopoeConfig, make_dirs: bool = True,
                 name: Optional[str] = None):
        """``name``: reattach to an EXISTING run directory (resume after a
        process restart/preemption) instead of minting a fresh timestamped
        one — the piece the reference's dead --load_saved flag never wired
        up (BaseFlags.py:39, SURVEY.md §5)."""
        self.cfg = cfg
        self.name = name or run_name(cfg)
        self.paths = create_dir_structure(cfg, self.name, train=make_dirs)
        self.labels = BINARY_LABELS if cfg.binary_labels else LABELS
        self.modalities = list(cfg.modality_names)
        self.subsets = subset_powerset(cfg.modality_names)
        # datasets BEFORE the model: a word-encoded real run learns its
        # vocab size from the built vocabulary (the reference mutates
        # flags.vocab_size inside the dataset, MimicDataset.py:54)
        self.set_datasets()
        vocab = getattr(self.dataset_train, "vocab", None)
        if vocab is not None and vocab.vocab_size != cfg.vocab_size:
            log.info(
                f"vocab_size {cfg.vocab_size} → {vocab.vocab_size} "
                "(from the built word vocabulary)"
            )
            self.cfg = cfg = cfg.replace(vocab_size=vocab.vocab_size)
        self.model = MMVae(cfg)
        self.tx = make_optimizer(cfg)
        self.tb_logger = TBLogger(self.name, self.paths["logs"]) if make_dirs else TBLogger(self.name, None)
        self.experiments_df: Optional[ExperimentDataframe] = None
        if make_dirs:
            self.experiments_df = ExperimentDataframe(
                f"{cfg.dir_experiment}/experiments_dataframe.csv", cfg, self.name
            )
        self.checkpoints = (
            CheckpointManager(self.paths["checkpoints"]) if make_dirs else None
        )
        if make_dirs:
            # persist the full config for --load_flags / auditability
            # (flags.rar parity, mimic/utils/utils.py:130-136)
            import json

            with open(f"{self.paths['experiment_run']}/config.json", "w") as f:
                json.dump(cfg.to_dict(), f, indent=2, default=str)

    # ------------------------------------------------------------------

    def set_datasets(self) -> None:
        cfg = self.cfg
        if cfg.dataset.lower() == "testing_structured":
            n = cfg.synthetic_length or 2 * cfg.batch_size
            self.dataset_train = SyntheticMimic(
                cfg, seed=0, length=n, structured=True,
                n_classes=cfg.synthetic_classes, noise=cfg.synthetic_noise,
            )
            self.dataset_test = SyntheticMimic(
                cfg, seed=1, length=max(n // 4, cfg.batch_size),
                structured=True, n_classes=cfg.synthetic_classes,
                noise=cfg.synthetic_noise,
            )
        elif cfg.dataset.lower() == "testing":
            self.dataset_train = SyntheticMimic(cfg, seed=0, length=cfg.synthetic_length)
            self.dataset_test = SyntheticMimic(cfg, seed=1, length=cfg.synthetic_length)
        else:
            from mopoe_mimic_tpu.data.mimic_dataset import MimicDataset

            self.dataset_train = MimicDataset(cfg, split="train")
            self.dataset_test = MimicDataset(cfg, split="eval")

    def make_loaders(self):
        cfg = self.cfg
        train_loader = BatchLoader(
            self.dataset_train,
            cfg.batch_size,
            shuffle=not cfg.weighted_sampler,
            seed=cfg.seed or 0,
            weighted=cfg.weighted_sampler,
        )
        test_loader = BatchLoader(
            self.dataset_test, cfg.batch_size, shuffle=True, seed=(cfg.seed or 0) + 1
        )
        return train_loader, test_loader

    def stores(self, mesh=None):
        """(train, test) DeviceStores when cfg.device_resident_data, else
        None. Built once and shared between the training loop and every
        eval — ONE upload of the dataset per process (the tunnel retains
        host buffers per upload, BENCH.md environment caveat)."""
        if not self.cfg.device_resident_data:
            return None
        cached_mesh = getattr(self, "_stores_mesh", None)
        if getattr(self, "_stores", None) is not None:
            # mesh=None means "whatever is cached"; a DIFFERENT real mesh
            # than the one the cache was built with must rebuild — an
            # unsharded (or wrongly sharded) store would feed a sharded
            # train step silently wrong on multi-chip meshes.
            if mesh is None or mesh is cached_mesh:
                return self._stores
            log.warning(
                "Experiment.stores: rebuilding DeviceStores for a new mesh "
                f"(cached={cached_mesh}, requested={mesh}) — this re-uploads "
                "the dataset (BENCH.md tunnel caveat: uploads retain host RAM)"
            )
        from mopoe_mimic_tpu.data.device_store import DeviceStore

        self._stores = (
            DeviceStore(self.dataset_train, self.cfg, mesh=mesh),
            DeviceStore(self.dataset_test, self.cfg, mesh=mesh),
        )
        self._stores_mesh = mesh
        return self._stores

    def cached_jit(self, key, builder):
        """Process-lifetime cache for jitted eval programs. jax's jit
        cache is keyed on the function OBJECT — an eval module that
        builds its jitted closure per call recompiles every eval round
        (measured ~100 s/round of pure remote_compile on the big fused
        coherence program). Builders close over stable per-run objects
        (self.model, cfg, cached classifiers), so one build per key is
        sound for the life of the experiment."""
        cache = self.__dict__.setdefault("_jit_cache", {})
        if key not in cache:
            cache[key] = builder()
        return cache[key]

    def submit_host_job(self, fn, name: str = "") -> None:
        """Run ``fn`` on the experiment's single host worker thread.

        Used by the eval suite to move pure-host work (plot rendering:
        PIL/matplotlib, ~20 s on this 1-core box) off the epoch path —
        it overlaps the next scanned train epoch, during which the host
        only waits on the one-dispatch-per-epoch RPC. One worker ⇒ jobs
        stay serialized in submission order. Exceptions are logged, not
        raised (plot failures were already warn-only, runner.py)."""
        import concurrent.futures

        ex = self.__dict__.get("_host_worker")
        if ex is None:
            ex = self._host_worker = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="host-jobs"
            )
            self._host_jobs = []

        def run():
            t0 = time.perf_counter()
            try:
                fn()
                log.info(
                    f"host job '{name or fn!r}' finished in "
                    f"{time.perf_counter() - t0:.1f}s (off the epoch path)"
                )
            except Exception as e:  # noqa: BLE001 — worker must not die
                log.warning(f"host job '{name}' FAILED: {e!r}", exc_info=True)

        self._host_jobs.append(ex.submit(run))

    def drain_host_jobs(self) -> None:
        """Block until every submitted host job has finished. Called at
        end of run (train/loop.py) so PNGs/TB images are durable before
        run_epochs returns — including on the NaN-restart path, where
        main.py wipes the run dir right after."""
        for f in self.__dict__.get("_host_jobs") or []:
            f.result()
        self._host_jobs = []

    def eval_batches(self, split: str = "test", epoch: int = 0):
        """(batch, labels) iterator for the eval suite — device-resident
        when enabled, else a fresh seeded loader with the same order
        semantics as make_loaders (PARITY.md 'test loader state' row)."""
        cfg = self.cfg
        seed = (cfg.seed or 0) + (1 if split == "test" else 0)
        bs = cfg.effective_eval_batch_size
        st = self.stores()
        if st is not None:
            store = st[0] if split == "train" else st[1]
            return store.iter_epoch(epoch, bs, shuffle=True, seed=seed)
        if bs == cfg.batch_size:
            train_loader, test_loader = self.make_loaders()
            loader = train_loader if split == "train" else test_loader
            loader.set_epoch(epoch)
            return iter(loader)
        # eval_batch_size override (reference forces batch 30,
        # run_epochs.py:188): a fresh loader at the eval batch size with
        # the same seeded-order semantics
        ds = self.dataset_train if split == "train" else self.dataset_test
        loader = BatchLoader(ds, bs, shuffle=True, seed=seed)
        loader.set_epoch(epoch)
        return iter(loader)

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed or 0)
        batch, _ = next(iter(self.make_loaders()[0]))
        return create_train_state(self.cfg, rng, batch, model=self.model, tx=self.tx)

    def mean_eval_metric(self, values) -> float:
        return float(np.mean(np.asarray(list(values))))
