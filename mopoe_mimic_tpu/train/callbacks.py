"""Training callbacks: early stopping, ReduceLROnPlateau, periodic
checkpoints (parity: Callbacks at mimic/utils/experiment.py:286-402).

* ReduceLROnPlateau(patience=5, factor=0.1) on the test loss
  (experiment.py:298) — implemented by scaling the injected Adam
  learning-rate hyperparameter; no recompilation.
* Early stopping: stop when the test loss hasn't improved for
  ``max_early_stopping_index`` consecutive test epochs, counting only
  after ``start_early_stopping_epoch`` (experiment.py:317-336).
* Checkpoint every ``checkpoint_freq`` epochs + on improvement + final
  (experiment.py:388-402), via orbax (with optimizer state — the
  reference never saved it).
"""

from __future__ import annotations

import math
from typing import Optional

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.train.state import TrainState, get_learning_rate, set_learning_rate
from mopoe_mimic_tpu.utils.logger import log


class ReduceLROnPlateau:
    def __init__(self, patience: int = 5, factor: float = 0.1, min_lr: float = 0.0):
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.best = math.inf
        self.bad_epochs = 0

    def step(self, state: TrainState, loss: float) -> TrainState:
        if loss < self.best:
            self.best = loss
            self.bad_epochs = 0
            return state
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            lr = max(get_learning_rate(state) * self.factor, self.min_lr)
            log.info(f"ReduceLROnPlateau: lowering lr to {lr:g}")
            self.bad_epochs = 0
            return set_learning_rate(state, lr)
        return state


class Callbacks:
    def __init__(self, cfg: MopoeConfig, checkpoint_manager=None, experiment_df=None,
                 plots_dir: str = ""):
        self.cfg = cfg
        self.ckpt = checkpoint_manager
        self.df = experiment_df
        self.plots_dir = plots_dir
        self.scheduler = ReduceLROnPlateau() if cfg.reduce_lr_on_plateau else None
        self.best_loss = math.inf
        self.early_stopping_index = 0
        self.loss_history: list[tuple[int, float]] = []

    def _plot_metric_evolution(self) -> None:
        """Loss-vs-epoch curve written to plots/ (metric-evolution plots,
        experiment.py:346-361)."""
        if not self.plots_dir or len(self.loss_history) < 2:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            xs, ys = zip(*self.loss_history)
            fig, ax = plt.subplots(figsize=(5, 3))
            ax.plot(xs, ys)
            ax.set_xlabel("epoch")
            ax.set_ylabel("test loss")
            fig.tight_layout()
            fig.savefig(f"{self.plots_dir}/test_loss_evolution.png")
            plt.close(fig)
        except Exception:
            pass

    def update_epoch(
        self, epoch: int, test_loss: float, state: TrainState, elapsed: float = 0.0
    ) -> tuple[bool, TrainState]:
        """Returns (stop_training, possibly-updated state)."""
        cfg = self.cfg
        self.loss_history.append((epoch, test_loss))
        self._plot_metric_evolution()
        if self.scheduler is not None:
            state = self.scheduler.step(state, test_loss)

        improved = test_loss < self.best_loss
        if improved:
            self.best_loss = test_loss
            self.early_stopping_index = 0
            if self.df is not None:
                self.df.update(
                    {"total_test_loss": test_loss, "best_epoch": epoch,
                     "mean_epoch_time": elapsed}
                )
        elif epoch >= cfg.start_early_stopping_epoch:
            self.early_stopping_index += 1

        if self.ckpt is not None:
            boundary = (epoch + 1) % cfg.checkpoint_freq == 0 or epoch == cfg.end_epoch - 1
            stage = getattr(self.ckpt, "stage", None)
            if improved and cfg.checkpoint_on_improvement and stage is not None and not boundary:
                # zero-traffic: hold the immutable device state as the
                # pending best; downloaded+written at the next boundary /
                # early stop / close / read (checkpoints.py module doc)
                stage(epoch, state, {"test_loss": test_loss})
            elif boundary or (improved and cfg.checkpoint_on_improvement):
                try:
                    self.ckpt.save(epoch, state, metrics={"test_loss": test_loss})
                except TypeError:  # manager without metric support
                    self.ckpt.save(epoch, state)

        stop = self.early_stopping_index > cfg.max_early_stopping_index
        if stop:
            log.info(
                f"early stopping at epoch {epoch}: no improvement for "
                f"{self.early_stopping_index} test epochs"
            )
            if self.ckpt is not None and hasattr(self.ckpt, "flush_staged"):
                self.ckpt.flush_staged()  # persist the staged best now
        return stop, state
