"""Device-resident dataset: the store lives in HBM, batches are gathered
on device — steady-state input transfer is just the index vector.

Motivation (measured, examples/profile_step.py): the flagship step
computes in ~12 ms resident, but streaming fresh host batches costs
~40× that over a thin host→device link (490 ms f32, 271 ms uint8 per
step) — the input pipeline, not compute, bounds training. The reference
has the same design pressure and answers it by loading the whole ``.pt``
tensor store into host RAM (mimic/dataio/MimicDataset.py:42-43); the
TPU-native answer is to park the compact store in HBM instead:

  * images as raw uint8 (4× smaller than float32; lossless when the
    on-disk store is uint8, ≤1/510 quantization otherwise — the same
    contract as cfg.transfer_uint8);
  * text as ids (int32 word ids, uint8 char ids) — the char one-hot is
    materialized per batch ON DEVICE (a [B,L,71] take of the identity),
    never stored;
  * a jitted gather turns an index vector into the model-ready float
    batch; dequantization and one-hot fuse into the step's first convs.

MIMIC at 128px uint8 is ~2.1 GB for 65k studies × 2 views — comfortably
inside a v5e's 16 GB HBM next to the ~50M-param model. ``fits()``
pre-checks the budget.

Multi-chip: single-host the store is replicated over the mesh and the
gathered batch is emitted sharded along the data axis (out_shardings), so
the per-step program is identical to the streaming path's. Multi-HOST
(jax.process_count() > 1, or shard_rows=True) the store itself is ONE
global array per column, row-sharded over the mesh's data axis: each
process fetches and uploads only the rows its local devices own
(jax.make_array_from_single_device_arrays) and the jitted gather's take
rides XLA's cross-device collectives — HBM per chip drops by the device
count, per-step transfer stays the [B] index vector.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.alphabet import ALPHABET
from mopoe_mimic_tpu.utils.logger import log


def _compact_images(col: np.ndarray) -> Tuple[np.ndarray, bool]:
    """HWC image column → (uint8 array, was_quantized)."""
    arr = np.asarray(col)
    if arr.dtype == np.uint8:
        return arr, False
    return np.round(np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8), True


class DeviceStore:
    """Upload a dataset's columns to device once; gather batches there.

    Parameters
    ----------
    dataset: any dataset with ``arrays`` column views and ``labels``
        (MimicDataset, SyntheticMimic). Columns are fetched once via
        fancy indexing over the full index range.
    cfg: supplies text encoding / sequence shape.
    mesh: optional — replicate the store over it and emit batches sharded
        along the data axis.
    quantize_uint8: store float images as uint8 (default; see module
        docstring). False keeps float32 (exact, 4× the HBM).
    """

    def __init__(
        self,
        dataset,
        cfg: MopoeConfig,
        mesh=None,
        quantize_uint8: bool = True,
        columns: Optional[Tuple[str, ...]] = None,
        shard_rows: Optional[bool] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        multi_host = jax.process_count() > 1
        if shard_rows is None:
            # multi-host: replication would need every process to upload
            # the full store — shard rows over the mesh instead, each
            # process uploads ONLY the rows its local devices own
            shard_rows = multi_host
        if shard_rows and mesh is None:
            raise ValueError("shard_rows=True requires a mesh")
        self.shard_rows = shard_rows
        n = len(dataset)
        self._n = n
        cols = dataset.arrays
        if columns is not None:  # e.g. a single modality for clf training
            cols = {k: v for k, v in cols.items() if k in columns}
        self._img_quantized: Dict[str, bool] = {}
        self._quantize_uint8 = quantize_uint8
        self._dataset = dataset

        self.labels = np.asarray(dataset.labels)
        if shard_rows:
            self._cols, self.nbytes = self._upload_sharded(dataset, cols, mesh)
        else:
            host: Dict[str, np.ndarray] = {}
            idx_all = np.arange(n)
            for k, col in cols.items():
                host[k] = self._fetch(dataset, col, k, idx_all)
            self.nbytes = sum(a.nbytes for a in host.values())
            if mesh is not None:
                from mopoe_mimic_tpu.parallel.mesh import replicated_sharding

                put = lambda a: jax.device_put(a, replicated_sharding(mesh))  # noqa: E731
            else:
                put = jax.device_put
            self._cols = {k: put(v) for k, v in host.items()}
        log.info(
            f"DeviceStore: {n} samples, {self.nbytes / 1e9:.2f} GB "
            f"{'row-sharded over the mesh' if shard_rows else 'resident on device'}"
        )
        self._gather = self._build_gather()

    # ------------------------------------------------------------------

    def _fetch(self, dataset, col, k: str, idx: np.ndarray) -> np.ndarray:
        """Host rows for global indices, in the store's compact form."""
        if k == "text":
            return self._compact_text(dataset, col, idx)
        if self._quantize_uint8 and hasattr(dataset, "image_uint8"):
            # raw-bytes fast path: skip the column's float dequant +
            # re-quantize round-trip (byte-exact for uint8 stores)
            arr = np.ascontiguousarray(dataset.image_uint8(k, idx))
            self._img_quantized[k] = True
            return arr
        if self._quantize_uint8:
            arr, q = _compact_images(np.ascontiguousarray(col[idx]))
            self._img_quantized[k] = q
            return arr
        arr = np.ascontiguousarray(col[idx])
        if arr.dtype == np.uint8:
            # uint8 source in the float path: dequantize here — the
            # gather only dequantizes uint8-dtype columns
            arr = arr.astype(np.float32) / 255.0
        else:
            arr = np.asarray(arr, np.float32)
        self._img_quantized[k] = False
        return arr

    def _upload_sharded(self, dataset, cols, mesh):
        """Row-sharded upload: the store is ONE global array per column,
        sharded along the mesh's data axis; each process fetches and
        device_puts only the row ranges its addressable devices own, then
        the global array is assembled with
        jax.make_array_from_single_device_arrays (the multi-host
        DeviceStore path, VERDICT r2 #6). Rows are padded (by repeating
        the last row) to a device-count multiple; iter_epoch only draws
        real indices so padding is never sampled."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
        n_dev = mesh.devices.size
        n_pad = -(-self._n // n_dev) * n_dev
        out: Dict[str, jax.Array] = {}
        nbytes = 0
        for k, col in cols.items():
            # probe one row for shape/dtype without fetching everything
            probe = self._fetch(dataset, col, k, np.arange(1))
            global_shape = (n_pad,) + probe.shape[1:]
            shards = []
            for dev, index in sharding.addressable_devices_indices_map(
                global_shape
            ).items():
                row_sl = index[0]
                rows = np.arange(row_sl.start or 0, row_sl.stop)
                rows = np.minimum(rows, self._n - 1)  # pad = repeat last row
                local = self._fetch(dataset, col, k, rows)
                shards.append(jax.device_put(local, dev))
                nbytes += local.nbytes
            out[k] = jax.make_array_from_single_device_arrays(
                global_shape, sharding, shards
            )
        return out, nbytes

    # ------------------------------------------------------------------

    def _compact_text(self, dataset, col, idx_all) -> np.ndarray:
        """Text column → id array ([N, L] int32 word ids / uint8 char ids)."""
        cfg = self.cfg
        if hasattr(dataset, "text_ids"):  # MimicDataset: encode ids directly
            return dataset.text_ids(idx_all)
        if cfg.text_encoding == "word":
            return np.asarray(col[idx_all], np.int32)
        # char without an ids accessor: argmax the one-hot column — the
        # exact inverse for genuine one-hots (all real data); non-one-hot
        # float fixtures (the unstructured synthetic) degrade to argmax
        onehot = np.asarray(col[idx_all])
        assert onehot.shape[-1] == len(ALPHABET), onehot.shape
        return np.argmax(onehot, axis=-1).astype(np.uint8)

    def _build_gather(self):
        cfg = self.cfg
        img_q = dict(self._img_quantized)
        char_mode = cfg.text_encoding == "char"
        n_alpha = len(ALPHABET)

        def gather(cols, idx):
            batch = {}
            for k, col in cols.items():
                rows = jnp.take(col, idx, axis=0)
                if k == "text":
                    if char_mode:
                        rows = jax.nn.one_hot(
                            rows.astype(jnp.int32), n_alpha, dtype=jnp.float32
                        )
                    else:
                        rows = rows.astype(jnp.int32)
                elif rows.dtype == jnp.uint8:
                    rows = rows.astype(jnp.float32) / 255.0
                batch[k] = rows
            return batch

        # the PURE fn is kept for inlining into larger jitted programs
        # (the lax.scan epoch runner, train/scan.py) — there the store
        # columns must travel as jit ARGUMENTS, not closure constants
        self.gather_fn = gather
        if self.mesh is not None:
            from mopoe_mimic_tpu.parallel.mesh import batch_sharding

            out = batch_sharding(self.mesh)
            return jax.jit(
                gather, out_shardings={k: out for k in self._cols}
            )
        return jax.jit(gather)

    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.labels)

    @property
    def cols(self) -> Dict[str, jax.Array]:
        """The device-resident column arrays (for passing as jit args)."""
        return self._cols

    def gather(self, idx: np.ndarray):
        """Index vector → model-ready device batch (floats/int ids)."""
        return self._gather(self._cols, jnp.asarray(idx, jnp.int32))

    def epoch_order(
        self, epoch: int, shuffle: bool = True, seed: int = 0,
        weighted: bool = False,
    ) -> np.ndarray:
        """The epoch's global sample order — the SAME draw iter_epoch
        makes, so scanned and per-step training see identical batches."""
        n = len(self)
        rng = np.random.default_rng((seed, epoch))
        if weighted:
            return rng.choice(n, size=n, replace=True, p=self._label_weights())
        if shuffle:
            return rng.permutation(n)
        return np.arange(n)

    def iter_epoch(
        self,
        epoch: int,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        weighted: bool = False,
    ) -> Iterator[Tuple[Dict[str, jnp.ndarray], np.ndarray]]:
        """Yields (device batch, host labels) like BatchLoader, but the
        only per-step upload is the [B] index vector. ``weighted`` draws
        the epoch order with replacement by inverse label-combination
        frequency — the WeightedRandomSampler analog (labels are host
        arrays, so the weighted draw composes with the on-device gather)."""
        n = len(self)
        order = self.epoch_order(epoch, shuffle=shuffle, seed=seed,
                                 weighted=weighted)
        nb = n // batch_size if drop_last else -(-n // batch_size)
        if nb == 0 and n > 0:
            # split smaller than one batch (tiny smoke runs): jit needs
            # the static batch shape, so yield ONE wraparound-padded
            # batch (repeated rows) instead of an empty epoch that
            # starves every consumer (e.g. collect_subset_means).
            log.warning(
                f"DeviceStore.iter_epoch: split has {n} rows < batch_size "
                f"{batch_size}; yielding one wraparound-padded batch"
            )
            idx = np.resize(order, batch_size)
            yield self.gather(idx), self.labels[idx]
            return
        for b in range(nb):
            idx = order[b * batch_size : (b + 1) * batch_size]
            yield self.gather(idx), self.labels[idx]

    def _label_weights(self) -> np.ndarray:
        if getattr(self, "_weights", None) is None:
            from mopoe_mimic_tpu.data.loader import BatchLoader

            self._weights = BatchLoader._label_weights(self.labels)
        return self._weights

    # ------------------------------------------------------------------

    @staticmethod
    def fits(dataset, cfg: MopoeConfig, budget_bytes: int = 12 << 30) -> bool:
        """Cheap pre-check: compact store size against an HBM budget
        (default 12 GB ≈ v5e 16 GB minus model/optimizer/activations)."""
        n = len(dataset)
        per = 0
        sample, _ = dataset[0]
        for k, v in sample.items():
            v = np.asarray(v)
            if k == "text":
                L = v.shape[0]
                per += L * (4 if cfg.text_encoding == "word" else 1)
            else:
                per += int(np.prod(v.shape))  # uint8
        return n * per <= budget_bytes
