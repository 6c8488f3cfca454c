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
    coincide.

Multi-host: each process constructs the loader over its own data shard and
feeds `jax.make_array_from_process_local_data`; see parallel/mesh.py.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        weighted: bool = False,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
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

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[Dict[str, np.ndarray], np.ndarray]]:
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, self.epoch))
        if self._weights is not None:
            order = rng.choice(n, size=n, replace=True, p=self._weights)
        elif self.shuffle:
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        cols = self.dataset.arrays
        labels = np.asarray(self.dataset.labels)
        nb = len(self)
        for b in range(nb):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            batch = {k: v[idx] for k, v in cols.items()}
            yield batch, labels[idx]
