"""Host-side batching: column-oriented numpy batches for device feeding.

Replaces torch DataLoader + DistributedSampler (mimic/dataio/utils.py:115-147):
  * datasets expose whole columns (`arrays`, `labels`) so a batch is pure
    numpy slicing — no per-item Python collation workers;
  * shuffling is a seeded per-epoch permutation (`set_epoch` parity with
    samplers_set_epoch, dataio/utils.py:144-147);
  * optional weighted sampling reproduces the WeightedRandomSampler path
    (dataio/utils.py:81-94): per-sample weight = inverse label-combination
    frequency;
  * `drop_last=True` always — jit needs static batch shapes. The reference
    instead rescaled partial batches implicitly by normalizing with
    flags.batch_size (kl_div.py:14-15); with full batches both contracts
    coincide. A split smaller than ONE batch yields a single
    wraparound-padded batch (repeated rows, warned loudly) so tiny smoke
    runs don't produce empty epochs.

Multi-host data sharding (DistributedSampler parity, dataio/utils.py:120-122
with per-epoch reshuffle at :144-147): every process draws the SAME global
per-epoch order (same seed → identical permutation), then keeps the strided
slice ``order[shard_index::num_shards]`` truncated to equal shard sizes, a
disjoint cover of the (truncated) epoch. ``batch_size`` stays the GLOBAL
batch — each host yields ``batch_size // num_shards`` rows, matching the
reference's batch division across ranks (main_mimic.py:48), and
``parallel/mesh.shard_batch`` assembles the global array via
``jax.make_array_from_process_local_data``. Deviation from
DistributedSampler's default: remainder rows are dropped (equal shards),
not padded by repetition — with drop_last batching both contracts see the
same number of optimizer steps.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np


def _default_shards() -> Tuple[int, int]:
    """(num_shards, shard_index) from the jax runtime; (1, 0) without it."""
    try:
        import jax

        return jax.process_count(), jax.process_index()
    except Exception:
        return 1, 0


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        weighted: bool = False,
        drop_last: bool = True,
        num_shards: Optional[int] = None,
        shard_index: Optional[int] = None,
    ):
        if num_shards is None or shard_index is None:
            num_shards, shard_index = _default_shards()
        if not (0 <= shard_index < num_shards):
            raise ValueError(f"shard_index {shard_index} not in [0, {num_shards})")
        if batch_size % num_shards != 0:
            raise ValueError(
                f"global batch_size {batch_size} must divide evenly across "
                f"{num_shards} host shards"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.local_batch_size = batch_size // num_shards
        self.shuffle = shuffle
        self.seed = seed
        self.weighted = weighted
        self.drop_last = drop_last
        self.epoch = 0
        if weighted:
            self._weights = self._label_weights(np.asarray(dataset.labels))
        else:
            self._weights = None

    @staticmethod
    def _label_weights(labels: np.ndarray) -> np.ndarray:
        """Inverse frequency of each label combination
        (dataio/utils.py:81-94)."""
        combos, inverse, counts = np.unique(
            labels, axis=0, return_inverse=True, return_counts=True
        )
        w = 1.0 / counts[inverse]
        return w / w.sum()

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _epoch_order(self) -> np.ndarray:
        """This host's slice of the shared global per-epoch order."""
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, self.epoch))
        if self._weights is not None:
            order = rng.choice(n, size=n, replace=True, p=self._weights)
        elif self.shuffle:
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        if self.num_shards > 1:
            usable = n - (n % self.num_shards)
            order = order[self.shard_index : usable : self.num_shards]
        return order

    def __len__(self) -> int:
        n = len(self._epoch_order())
        bs = self.local_batch_size
        if self.drop_last:
            # dataset (or host shard) smaller than one batch: one
            # wraparound-padded batch (see __iter__), not zero.
            return max(n // bs, 1 if n > 0 else 0)
        return -(-n // bs)

    def __iter__(self) -> Iterator[Tuple[Dict[str, np.ndarray], np.ndarray]]:
        order = self._epoch_order()
        cols = self.dataset.arrays
        labels = np.asarray(self.dataset.labels)
        bs = self.local_batch_size
        if self.drop_last and len(order) > 0 and len(order) < bs:
            # jit needs static batch shapes, so a split smaller than one
            # batch yields ONE wraparound-padded batch (repeated rows)
            # instead of an empty epoch that starves every consumer.
            from mopoe_mimic_tpu.utils.logger import log

            log.warning(
                f"BatchLoader: split has {len(order)} rows < batch_size "
                f"{bs}; yielding one wraparound-padded batch"
            )
            idx = np.resize(order, bs)
            yield {k: v[idx] for k, v in cols.items()}, labels[idx]
            return
        nb = len(self)
        for b in range(nb):
            idx = order[b * bs : (b + 1) * bs]
            batch = {k: v[idx] for k, v in cols.items()}
            yield batch, labels[idx]
