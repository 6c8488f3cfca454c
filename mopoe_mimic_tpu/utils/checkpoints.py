"""Orbax checkpointing with true resume, best-k retention, async saves.

The reference saves per-network state_dicts every 50 epochs
(mimic/utils/experiment.py:388-402) but never saves optimizer state and
has no resume wiring (SURVEY.md §5). Here the whole TrainState (params,
batch_stats, opt_state, step, rng) plus the epoch index round-trips
through orbax.

Retention = best-k by test loss PLUS always the latest:
  * ``BestN(n=max_to_keep)`` on the ``test_loss`` metric — a long plateau
    can never evict the best checkpoint;
  * ``LatestN(1)`` — resume-from-latest always works even when the latest
    epoch is not among the best.
Saves without a metric (periodic/final saves before any test pass) are
retained by BestN's keep_checkpoints_without_metrics.

Async saves: the device→host download of the full TrainState costs
seconds over a thin link and was the steady-state epoch bottleneck once
the compute moved into one scanned dispatch (train/scan.py). TrainState
is immutable — the training loop replaces it rather than mutating — so a
background worker can snapshot an epoch's state while later epochs train.
The queue is bounded (2): if the writer falls behind, save() briefly
blocks instead of pinning unbounded device memory. Every read API
(restore / latest_epoch / best_epoch / all_epochs) drains pending saves
first, so save-then-restore semantics are unchanged.

Staged best (``stage``/``flush_staged``): improvement-epoch saves are
*staged*, not written — staging snapshots the TrainState to fresh device
buffers (one on-device copy, zero link traffic; a bare python reference
is NOT enough — buffer donation by the next train dispatch deletes the
original buffers). Early training improves almost every epoch, and each eager
~450 MB state download saturated the host↔device link for ~13 s/epoch
(measured: the next test pass's RPCs queue behind it). The staged best
is downloaded+written only at checkpoint_freq boundaries, on early
stop, at the final epoch, on close(), and before any read — so the
best state is never lost at run end, and mid-run crash exposure is
bounded by checkpoint_freq exactly like the reference's every-50-epochs
policy (experiment.py:388-402). A superseded staged best (a newer
improvement before any flush) is simply replaced; HBM holds at most one
extra TrainState.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp
from orbax.checkpoint.checkpoint_managers import preservation_policy as _pp

import jax.numpy as jnp

from mopoe_mimic_tpu.train.state import TrainState

# Fresh device buffers for a TrainState (one HBM pass, zero link traffic).
# Holding a Python reference does NOT keep buffers alive under buffer
# donation: the next train dispatch (cfg.donate_state) donates the current
# state's buffers and jax DELETES them, so a staged best — or a state
# still queued for an async download — would be dead by the time it is
# written (measured: 'Array has been deleted' at the final flush of the
# 65k rehearsal). Copying at stage/enqueue time makes the snapshot durable.
_device_copy = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True):
        policy = _pp.AnyPreservationPolicy(policies=[
            # reverse=True sorts descending so the n *lowest* losses survive
            _pp.BestN(get_metric_fn=_get_test_loss, reverse=True, n=max_to_keep),
            _pp.LatestN(n=1),
        ])
        self._mgr = ocp.CheckpointManager(
            Path(directory).absolute(),
            options=ocp.CheckpointManagerOptions(
                preservation_policy=policy,
                best_fn=_get_test_loss,
                best_mode="min",
                create=True,
                # our own queue already provides save/train overlap; a
                # second async layer inside orbax means _save_sync can
                # return with the step UNCOMMITTED — a crash before the
                # next wait_until_finished() then loses every pending
                # step (orbax GCs uncommitted step dirs on reopen;
                # observed: a 12-epoch run OOM-killed during final evals
                # lost both its boundary checkpoints). Synchronous commit
                # makes each queue item durable-on-completion.
                enable_async_checkpointing=False,
            ),
        )
        self._queue: Optional[queue.Queue] = None
        self._worker: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None
        self._staged: Optional[Tuple[int, TrainState, Optional[Dict]]] = None
        if async_save:
            self._queue = queue.Queue(maxsize=2)
            self._worker = threading.Thread(
                target=self._drain, name="ckpt-writer", daemon=True
            )
            self._worker.start()

    # -- async worker ---------------------------------------------------

    def _drain(self) -> None:
        while True:
            item = self._queue.get()
            try:
                if item is None:
                    return
                epoch, state, metrics, force = item
                self._save_sync(epoch, state, metrics, force)
            except BaseException as e:  # surfaced on the next save/read
                self._error = e
            finally:
                self._queue.task_done()

    def _raise_pending(self) -> None:
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from err

    def _save_sync(self, epoch, state, metrics, force) -> None:
        self._mgr.save(
            epoch,
            args=ocp.args.StandardSave(jax.device_get(state)),
            metrics=metrics,
            force=force,
        )

    # -- public API -----------------------------------------------------

    def save(
        self,
        epoch: int,
        state: TrainState,
        force: bool = False,
        metrics: Optional[Dict[str, Any]] = None,
    ) -> None:
        # Single-writer semantics (reference: rank-0-only,
        # experiment.py:391-393) are delegated to orbax's primary-host
        # protocol: in a multi-controller runtime EVERY process must
        # enter save() — orbax synchronizes them with cross-process
        # barriers and only the primary host writes; an early return on
        # non-zero ranks deadlocks rank 0 inside ocp.CheckpointManager
        # (found by the 2-process spmd test's checkpoint phase).
        if self._staged is not None:
            # keep orbax steps monotonic: write (or drop, if same-epoch)
            # the pending staged best before this newer save
            s_epoch, s_state, s_metrics = self._staged
            self._staged = None
            if s_epoch < epoch:
                self.save(s_epoch, s_state, metrics=s_metrics)
        self._raise_pending()
        if self._queue is not None:
            # snapshot to fresh device buffers: the caller's state buffers
            # may be DONATED into the next dispatch before the worker's
            # download completes (see _device_copy)
            self._queue.put((epoch, _device_copy(state), metrics, force))
        else:
            self._save_sync(epoch, state, metrics, force)
            self._mgr.wait_until_finished()

    def stage(
        self,
        epoch: int,
        state: TrainState,
        metrics: Optional[Dict[str, float]] = None,
    ) -> None:
        """Hold ``state`` as the pending best WITHOUT downloading it.

        The state is snapshotted to fresh device buffers (one HBM pass,
        zero link traffic — see _device_copy: a bare reference dies when
        the next dispatch donates the buffers); the download + orbax
        write happen at the next flush_staged() (boundary/stop/close/
        read). A newer stage() replaces an unflushed older one.

        Every process stages (cheap device copy): the eventual
        flush_staged()→save() must be entered by ALL ranks for orbax's
        primary-host write protocol — see save()."""
        self._staged = (epoch, _device_copy(state), metrics)

    def flush_staged(self) -> None:
        """Write the pending staged best, if any (one state download)."""
        if self._staged is None:
            return
        epoch, state, metrics = self._staged
        self._staged = None
        self.save(epoch, state, metrics=metrics)

    def wait_until_finished(self) -> None:
        self.flush_staged()
        if self._queue is not None:
            self._queue.join()
        self._mgr.wait_until_finished()
        self._raise_pending()

    def restore(
        self, state_template: TrainState, epoch: Optional[int] = None
    ) -> Tuple[int, TrainState]:
        self.wait_until_finished()
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(jax.device_get(state_template))
        )
        return step, restored

    def latest_epoch(self) -> Optional[int]:
        self.wait_until_finished()
        return self._mgr.latest_step()

    def best_epoch(self) -> Optional[int]:
        """Epoch of the lowest recorded test loss among retained
        checkpoints (None when no save carried metrics)."""
        self.wait_until_finished()
        return self._mgr.best_step()

    def all_epochs(self):
        self.wait_until_finished()
        return self._mgr.all_steps()

    def close(self):
        self.flush_staged()
        if self._queue is not None and self._worker is not None:
            self._queue.join()
            self._queue.put(None)
            self._worker.join()
            self._worker = None
        self._mgr.close()
        self._raise_pending()


def _get_test_loss(metrics) -> float:
    return float(metrics["test_loss"])
