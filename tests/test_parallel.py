"""Mesh/sharding layer on the virtual 8-device CPU mesh (the multi-device
analog of the reference's single-host DDP test,
mimic/tests/test_training.py:116-119)."""

import jax
import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate_state, replicated_sharding, shard_batch,
)


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    sharded = shard_batch(mesh, batch)
    sh = sharded["x"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), ndim=2)
    # each device holds 16/8 = 2 rows
    assert sharded["x"].addressable_shards[0].data.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_replicate_state():
    mesh = make_mesh()
    state = {"w": np.ones((4, 4), np.float32)}
    rep = replicate_state(mesh, state)
    assert rep["w"].sharding.is_equivalent_to(replicated_sharding(mesh), ndim=2)


def test_sharded_train_step_multidevice():
    """One full MoPoE train step over the 8-device mesh: grads all-reduce
    via the partitioner, loss finite, state stays replicated."""
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.train import create_train_state, make_train_step

    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", batch_size=16, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=50, compute_dtype="float32",
    )
    mesh = make_mesh(cfg)
    ds = SyntheticMimic(cfg, seed=0)
    batch, _ = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state = replicate_state(mesh, state)
    step = make_train_step(cfg)
    state, metrics = step(state, shard_batch(mesh, batch))
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss)
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_equivalent_to(replicated_sharding(mesh), ndim=leaf.ndim)


@pytest.mark.slow
def test_device_count_invariance_sync_bn():
    """The sharded step must produce the SAME loss as the single-device
    step on the same batch — GSPMD semantics are device-count-invariant,
    which also means BatchNorm statistics are computed over the GLOBAL
    batch (sync-BN by construction; PARITY.md deviation row). The
    reference's DDP computes per-replica BN stats instead."""
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.train import create_train_state, make_train_step

    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", batch_size=16, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=50, compute_dtype="float32", seed=5,
    )
    ds = SyntheticMimic(cfg, seed=0)
    batch, _ = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))
    step = make_train_step(cfg)

    losses = {}
    for n_dev in (1, 8):
        mesh = make_mesh(cfg, devices=jax.devices()[:n_dev])
        state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
        state = replicate_state(mesh, state)
        _, metrics = step(state, shard_batch(mesh, batch))
        losses[n_dev] = float(metrics["total_loss"])
    np.testing.assert_allclose(losses[1], losses[8], rtol=1e-5)
