"""Device-resident dataset (data/device_store.py): gather parity with the
host loader, on-device one-hot/dequant contracts, epoch iteration."""

import jax
import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.device_store import DeviceStore
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.parallel.mesh import make_mesh


def _cfg(**kw):
    base = dict(
        method="joint_elbo", dataset="testing", batch_size=8, class_dim=4,
        DIM_img=2, DIM_text=2, img_size=64, text_encoding="word",
        vocab_size=40, compute_dtype="float32",
    )
    base.update(kw)
    return MopoeConfig(**base)


@pytest.mark.parametrize("encoding", ["word", "char"])
def test_gather_matches_host_loader(encoding):
    cfg = _cfg(text_encoding=encoding)
    # char compaction is argmax of the one-hot → use the structured fixture
    # (true one-hots); the unstructured one emits uniform floats there
    ds = SyntheticMimic(cfg, seed=0, length=16, structured=(encoding == "char"))
    store = DeviceStore(ds, cfg)
    idx = np.array([3, 0, 7, 12])
    got = jax.device_get(store.gather(idx))

    cols = ds.arrays
    want = {k: np.asarray(v[idx]) for k, v in cols.items()}
    # word: ids pass through; char: on-device one-hot of stored ids
    np.testing.assert_array_equal(got["text"], want["text"])
    # images round-trip through uint8 (≤1/510 quantization)
    assert np.abs(got["PA"] - want["PA"]).max() <= 0.5 / 255 + 1e-7
    assert got["PA"].dtype == np.float32


def test_gather_sharded_over_mesh():
    cfg = _cfg()
    mesh = make_mesh(cfg)
    ds = SyntheticMimic(cfg, seed=0, length=16)
    store = DeviceStore(ds, cfg, mesh=mesh)
    batch = store.gather(np.arange(8))
    assert batch["PA"].sharding.spec[0] == cfg.data_axis


def test_row_sharded_store_matches_replicated():
    """Multi-host store path (VERDICT r2 #6): rows sharded over the mesh's
    data axis (each process would upload only its shard) must gather
    byte-identical batches to the replicated single-host store — including
    a length that does NOT divide the device count (padding path)."""
    cfg = _cfg()
    mesh = make_mesh(cfg)
    ds = SyntheticMimic(cfg, seed=0, length=19)  # 19 % 8 != 0 → padding
    rep = DeviceStore(ds, cfg, mesh=mesh)
    shd = DeviceStore(ds, cfg, mesh=mesh, shard_rows=True)
    # per-column storage is 1/n_dev per device (here: same process owns all)
    assert shd.shard_rows
    idx = np.array([0, 5, 18, 3, 7, 11, 2, 16])
    a = jax.device_get(rep.gather(idx))
    b = jax.device_get(shd.gather(idx))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    # batches still come out sharded along the data axis
    batch = shd.gather(idx)
    assert batch["PA"].sharding.spec[0] == cfg.data_axis
    # and the sharded store feeds the sharded train step
    from mopoe_mimic_tpu.train import create_train_state, make_train_step
    from mopoe_mimic_tpu.parallel.mesh import replicate_state

    b0, _ = next(shd.iter_epoch(0, 8))
    state = replicate_state(mesh, create_train_state(cfg, jax.random.PRNGKey(0), b0))
    step = make_train_step(cfg)
    _, metrics = step(state, b0)
    assert np.isfinite(float(metrics["total_loss"]))


def test_iter_epoch_covers_and_reshuffles():
    cfg = _cfg()
    ds = SyntheticMimic(cfg, seed=0, length=24)
    store = DeviceStore(ds, cfg)
    seen = []
    labels_by_step = []
    for batch, labels in store.iter_epoch(0, 8, seed=5):
        assert batch["PA"].shape[0] == 8
        labels_by_step.append(labels)
        seen.append(labels.tobytes())
    assert len(labels_by_step) == 3  # 24 / 8, drop_last
    other = [lab.tobytes() for _, lab in store.iter_epoch(1, 8, seed=5)]
    assert seen != other  # per-epoch reshuffle
    again = [lab.tobytes() for _, lab in store.iter_epoch(0, 8, seed=5)]
    assert seen == again  # deterministic per (seed, epoch)


def test_iter_epoch_split_smaller_than_batch_wraps():
    # tiny eval splits (rows < batch) yield one wraparound-padded batch
    # instead of an empty epoch that starves the eval suite
    cfg = _cfg()
    ds = SyntheticMimic(cfg, seed=0, length=5)
    store = DeviceStore(ds, cfg)
    batches = list(store.iter_epoch(0, 8, seed=3))
    assert len(batches) == 1
    batch, labels = batches[0]
    assert batch["PA"].shape[0] == 8 and labels.shape[0] == 8

    from mopoe_mimic_tpu.train.scan import epoch_index_matrix

    idx = epoch_index_matrix(store, 0, 8, seed=3)
    assert idx.shape == (1, 8)
    assert set(idx.ravel().tolist()) <= set(range(5))


def test_train_step_runs_from_store():
    cfg = _cfg()
    ds = SyntheticMimic(cfg, seed=0, length=16)
    store = DeviceStore(ds, cfg)
    from mopoe_mimic_tpu.train import create_train_state, make_train_step

    batch, _ = next(store.iter_epoch(0, cfg.batch_size))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))


def test_fits_budget():
    cfg = _cfg()
    ds = SyntheticMimic(cfg, seed=0, length=16)
    assert DeviceStore.fits(ds, cfg)
    assert not DeviceStore.fits(ds, cfg, budget_bytes=100)


def test_mimic_text_ids_matches_onehot(tmp_path):
    """MimicDataset.text_ids (char) == argmax of the one-hot column."""
    from tests.test_real_data_path import _make_fake_mimic_tree
    from mopoe_mimic_tpu.data.mimic_dataset import MimicDataset
    from mopoe_mimic_tpu.data.tensor_builder import TensorDatasetBuilder

    _make_fake_mimic_tree(tmp_path)
    TensorDatasetBuilder(str(tmp_path), str(tmp_path / "out"), img_size=64)()
    cfg = _cfg(dataset="Mimic", dir_data=str(tmp_path / "out"),
               text_encoding="char")
    ds = MimicDataset(cfg, "train")
    idx = np.arange(len(ds))
    ids = ds.text_ids(idx)
    assert ids.dtype == np.uint8
    onehot = ds.arrays["text"][idx]
    np.testing.assert_array_equal(ids, np.argmax(onehot, axis=-1))

    # DeviceStore over the real dataset prefers the ids path
    store = DeviceStore(ds, cfg)
    got = jax.device_get(store.gather(np.array([0, 1])))
    np.testing.assert_array_equal(got["text"], np.asarray(onehot[np.array([0, 1])]))


@pytest.mark.slow
def test_run_epochs_with_device_resident_data(tmp_path):
    """End-to-end loop integration: cfg.device_resident_data trains from
    the HBM store (train + test passes) and produces finite losses."""
    from mopoe_mimic_tpu.experiment import Experiment
    from mopoe_mimic_tpu.train.loop import run_epochs

    cfg = _cfg(
        dataset="testing", device_resident_data=True, batch_size=8,
        end_epoch=2, steps_per_training_epoch=2, eval_freq=100,
        dir_experiment=str(tmp_path),
    )
    exp = Experiment(cfg)
    out = run_epochs(exp)
    assert out["epochs_run"] == 2
    assert np.isfinite(float(out["test"]["total_loss"]))


def test_clf_trainer_uses_device_store():
    """cfg.device_resident_data routes classifier training through the
    single-modality HBM store and still learns/evaluates."""
    from mopoe_mimic_tpu.train.clf_trainer import train_classifier

    cfg = _cfg(device_resident_data=True, steps_per_training_epoch=2)
    ds_tr = SyntheticMimic(cfg, seed=0, length=16)
    ds_ev = SyntheticMimic(cfg, seed=1, length=8)
    state, results = train_classifier(
        cfg, "PA", ds_tr, ds_ev, n_labels=3, max_epochs=2, write_df=False)
    assert "accuracy" in results or "dice" in results


@pytest.mark.slow
def test_eval_suite_runs_from_device_store(tmp_path):
    """All four heavy evals consume exp.eval_batches from the HBM store."""
    from mopoe_mimic_tpu.evaluation.runner import run_eval_suite
    from mopoe_mimic_tpu.experiment import Experiment
    from mopoe_mimic_tpu.train.loop import run_epochs

    cfg = _cfg(
        dataset="testing_structured", device_resident_data=True, batch_size=8,
        end_epoch=1, steps_per_training_epoch=2, eval_freq=100,
        synthetic_length=16, eval_lr=True, use_clf=True, calc_nll=True,
        calc_prd=True, clf_quick_epochs=1, num_imp_samples=2,
        eval_freq_fid=1, dir_experiment=str(tmp_path),
        dir_clf=str(tmp_path / "clf"),
    )
    exp = Experiment(cfg)
    out = run_epochs(exp)
    results = run_eval_suite(exp, out["state"], epoch=0)
    assert any(k.startswith("lr_eval") for k in results)
    assert any(k.startswith("likelihoods") for k in results)
    # the embedder is cached on the experiment after the PRD pass
    assert getattr(exp, "_fid_embedder", None) is not None


@pytest.mark.slow  # >30s on the 1-core box; excluded from the fast gate
def test_iter_epoch_weighted_oversamples_rare_combo():
    """weighted=True draws by inverse label-combination frequency
    (WeightedRandomSampler parity, dataio/utils.py:81-94)."""
    cfg = _cfg()
    ds = SyntheticMimic(cfg, seed=0, length=64)
    # skew: make one combo rare
    ds.labels[:] = 0.0
    ds.labels[:4, 0] = 1.0  # 4 rare vs 60 common
    store = DeviceStore(ds, cfg)
    drawn = np.concatenate([
        lab for _, lab in store.iter_epoch(0, 8, weighted=True, seed=3)
    ])
    rare_frac = float((drawn[:, 0] == 1.0).mean())
    assert 0.3 < rare_frac < 0.7  # balanced, not the raw 1/16

    cfg2 = _cfg(dataset="testing", device_resident_data=True,
                weighted_sampler=True, batch_size=8, end_epoch=1,
                steps_per_training_epoch=2, eval_freq=100)
    import tempfile

    from mopoe_mimic_tpu.experiment import Experiment
    from mopoe_mimic_tpu.train.loop import run_epochs

    with tempfile.TemporaryDirectory() as d:
        out = run_epochs(Experiment(cfg2.replace(dir_experiment=d)))
    assert np.isfinite(float(out["train"]["total_loss"]))


def test_float_store_dequantizes_uint8_source(tmp_path):
    """ADVICE r2: DeviceStore(quantize_uint8=False) over a uint8 on-disk
    store must still emit [0,1] floats — and the host loader's contract is
    float [0,1] regardless of cfg.transfer_uint8."""
    from tests.test_real_data_path import _make_fake_mimic_tree
    from mopoe_mimic_tpu.data.mimic_dataset import MimicDataset
    from mopoe_mimic_tpu.data.tensor_builder import TensorDatasetBuilder

    _make_fake_mimic_tree(tmp_path)
    TensorDatasetBuilder(str(tmp_path), str(tmp_path / "out"), img_size=64)()
    cfg = _cfg(dataset="Mimic", dir_data=str(tmp_path / "out"),
               text_encoding="char", transfer_uint8=True)
    ds = MimicDataset(cfg, "train")

    # loader contract: float [0,1] even with transfer_uint8 on
    batch, _ = next(iter(BatchLoader(ds, 2, shuffle=False)))
    assert batch["PA"].dtype == np.float32 and float(batch["PA"].max()) <= 1.0

    idx = np.array([0, 1])
    want = np.asarray(ds.arrays["PA"][idx])
    for quant in (True, False):
        store = DeviceStore(ds, cfg, quantize_uint8=quant)
        got = jax.device_get(store.gather(idx))
        assert got["PA"].dtype == np.float32
        np.testing.assert_allclose(got["PA"], want, atol=1e-7)  # byte-exact


def test_iter_epoch_drop_last_false_keeps_remainder():
    cfg = _cfg()
    ds = SyntheticMimic(cfg, seed=0, length=20)
    store = DeviceStore(ds, cfg)
    batches = list(store.iter_epoch(0, 8, drop_last=False))
    assert [b["PA"].shape[0] for b, _ in batches] == [8, 8, 4]
