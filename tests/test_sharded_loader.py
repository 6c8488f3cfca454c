"""Per-host data sharding (DistributedSampler parity,
mimic/dataio/utils.py:120-147): disjoint equal shards of a shared global
per-epoch order, global-batch reassembly, per-epoch reshuffle."""

import numpy as np
import pytest

from mopoe_mimic_tpu.data.loader import BatchLoader


class _DS:
    def __init__(self, n):
        self.arrays = {"x": np.arange(n, dtype=np.int64)}
        self.labels = np.zeros((n, 3), dtype=np.float32)

    def __len__(self):
        return len(self.arrays["x"])


def _shard_loaders(n, bs, k, **kw):
    return [
        BatchLoader(_DS(n), bs, seed=7, num_shards=k, shard_index=i, **kw)
        for i in range(k)
    ]


def test_disjoint_equal_cover():
    n, k = 103, 4  # remainder 3 → truncated to 100
    loaders = _shard_loaders(n, bs=8, k=k)
    orders = [ld._epoch_order() for ld in loaders]
    sizes = {len(o) for o in orders}
    assert sizes == {25}, "shards must be equal-sized"
    all_idx = np.concatenate(orders)
    assert len(np.unique(all_idx)) == 100, "shards must be disjoint"


def test_global_batch_reassembly():
    """Concatenating the k hosts' local batches b reproduces exactly the
    unsharded loader's global batch b (as an index set)."""
    n, bs, k = 64, 16, 4
    global_loader = BatchLoader(_DS(n), bs, seed=7, num_shards=1, shard_index=0)
    shard_loaders = _shard_loaders(n, bs, k)
    for ld in shard_loaders + [global_loader]:
        ld.set_epoch(3)
    global_batches = [b["x"] for b, _ in global_loader]
    shard_batches = [[b["x"] for b, _ in ld] for ld in shard_loaders]
    assert len(global_batches) == len(shard_batches[0]) == n // bs
    for bi, gb in enumerate(global_batches):
        local = np.concatenate([sb[bi] for sb in shard_batches])
        assert local.shape == (bs,), "local batches must sum to the global batch"
        assert set(local.tolist()) == set(gb.tolist())


def test_per_epoch_reshuffle_consistent_across_shards():
    loaders = _shard_loaders(50, bs=10, k=2)
    loaders[0].set_epoch(0)
    o0 = loaders[0]._epoch_order().copy()
    loaders[0].set_epoch(1)
    o1 = loaders[0]._epoch_order()
    assert not np.array_equal(o0, o1), "epochs must reshuffle"
    # every shard derives from the same global permutation per epoch
    for ep in (0, 5):
        for ld in loaders:
            ld.set_epoch(ep)
        union = np.concatenate([ld._epoch_order() for ld in loaders])
        assert len(np.unique(union)) == 50


def test_weighted_sampling_shards_consistently():
    ds = _DS(40)
    ds.labels[:4] = 1.0  # rare combo → upweighted
    loaders = [
        BatchLoader(ds, 8, seed=3, weighted=True, num_shards=2, shard_index=i)
        for i in range(2)
    ]
    # same global draw on both hosts: union covers the strided split of one draw
    rng = np.random.default_rng((3, 0))
    w = BatchLoader._label_weights(ds.labels)
    global_draw = rng.choice(40, size=40, replace=True, p=w)
    union = np.concatenate([ld._epoch_order() for ld in loaders])
    assert sorted(union.tolist()) == sorted(global_draw.tolist())


def test_invalid_shard_config():
    with pytest.raises(ValueError):
        BatchLoader(_DS(8), 7, num_shards=2, shard_index=0)  # 7 % 2 != 0
    with pytest.raises(ValueError):
        BatchLoader(_DS(8), 8, num_shards=2, shard_index=2)
