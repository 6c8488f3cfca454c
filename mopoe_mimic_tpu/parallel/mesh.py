"""Device mesh + sharding layout — the TPU-native replacement for the
reference's distributed stack.

The reference scales with one process per GPU: mp.spawn + DDP + a gloo
process group hard-wired to localhost:12355 + DistributedSampler
(mimic/main_mimic.py:44-67, mimic/utils/utils.py:179-186,
mimic/run_epochs.py:245-247, mimic/dataio/utils.py:120-122). Here the whole
program is single-controller SPMD:

  * one `jax.sharding.Mesh` over all devices, batch sharded along the
    'data' axis, parameters/optimizer state replicated;
  * the jitted train step runs unmodified on any mesh size — the XLA
    partitioner inserts the gradient `psum` over ICI (DDP's all-reduce
    equivalent), no process supervision, no rendezvous;
  * multi-host slices call `init_multihost()` (jax.distributed.initialize)
    and run the same program; each host feeds its local shard via
    `jax.make_array_from_process_local_data`.

The model is ~10-50M params (SURVEY.md §2.7) so data parallelism is the
whole story; the mesh helper still accepts extra axes for forward
compatibility (e.g. ('data', 'model') for a future tensor-parallel head).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mopoe_mimic_tpu.config import MopoeConfig

DATA_AXIS = "data"


def make_mesh(
    cfg: Optional[MopoeConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Tuple[int, ...] = (),
    axis_names: Tuple[str, ...] = (),
) -> Mesh:
    data_axis = cfg.data_axis if cfg is not None else DATA_AXIS
    axis_names = axis_names or (data_axis,)
    devices = list(devices) if devices is not None else jax.devices()
    shape = shape or (cfg.mesh_shape if cfg else ()) or (len(devices),)
    if len(shape) != len(axis_names):
        axis_names = tuple(
            [data_axis] + [f"axis{i}" for i in range(1, len(shape))]
        )
    mesh_devices = np.array(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(mesh_devices, axis_names=axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: sharded along the data axis (the mesh's first axis),
    replicated elsewhere."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Place a host batch onto the mesh, sharded on axis 0.

    Single-process path: device_put with a NamedSharding. Multi-host: each
    process holds only its slice, so use
    jax.make_array_from_process_local_data instead.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in batch.items()
        }
    return jax.device_put(batch, sharding)


def replicate_state(mesh: Mesh, state):
    """Replicate the train state pytree across the mesh.

    Multi-process: `jax.device_put` onto a cross-process sharding runs a
    hidden `multihost_utils.assert_equal` — one allgather COLLECTIVE per
    pytree leaf to verify every process passed the same value. For a
    TrainState that is dozens of gloo rendezvous + tiny compiles before
    training starts (measured: it blew the 30 s gloo handshake window on
    a contended host). States are seeded identically on every process by
    construction, so build the global arrays from process-local data
    instead — zero collectives, like shard_batch."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            state,
        )
    return jax.device_put(state, sharding)


def allgather_rows(x) -> np.ndarray:
    """Row-concatenate a per-process host array across controllers
    (axis 0, process order); identity single-controller.

    The multi-host eval contract: each controller's eval loader yields its
    HOST SHARD of the test set (data/loader.py auto-shards by
    process_count), each rank computes per-sample quantities for its
    shard, and the collection point assembles the full set on EVERY rank
    with this gather — so eval metrics are global and rank-identical
    (asserted by parallel/spmd_smoke.py's heavy-eval phase). The
    reference has no multi-host eval at all (its test() runs on rank 0's
    full copy, run_epochs.py:190-219)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(x), tiled=True)
    )


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (call once before building the mesh).

    On Cloud TPU all arguments are auto-detected from the metadata server;
    explicit values support other clusters. Replaces set_up_process_group
    (mimic/utils/utils.py:179-186).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
