"""Real-data pipeline end-to-end on a simulated MIMIC-CXR-JPG tree:
offline builder (JPEG → center-crop → resize → .npy stores + CSVs) →
MimicDataset (label filtering, char/word text encoding, vocab build) →
BatchLoader → one train step. Closes the loop the synthetic fixture
can't: file formats, CSV joins, vocab persistence, memmap gathers."""

import os

import numpy as np
import pandas as pd
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.data.mimic_dataset import MimicDataset
from mopoe_mimic_tpu.data.tensor_builder import TensorDatasetBuilder, create_toy_set, dataset_stats

FINDINGS = [
    "there is no focal consolidation pleural effusion or pneumothorax",
    "mild pulmonary edema with small bilateral effusions noted",
    "the lungs are clear without evidence of pneumonia",
    "support devices in standard position no acute findings",
    "increased opacity at the left base likely atelectasis",
    "no significant interval change from prior examination",
]


def _make_fake_mimic_tree(root, n=6):
    from PIL import Image

    rng = np.random.default_rng(0)
    os.makedirs(root / "jpgs", exist_ok=True)
    rows = []
    for i in range(n):
        for view in ("pa", "lat"):
            arr = (rng.random((90, 70)) * 255).astype(np.uint8)
            Image.fromarray(arr, mode="L").save(root / "jpgs" / f"{i}_{view}.jpg")
        rows.append({
            "path_pa": f"jpgs/{i}_pa.jpg",
            "path_lat": f"jpgs/{i}_lat.jpg",
            "findings": FINDINGS[i % len(FINDINGS)],
            "Lung Opacity": int(i % 2),
            "Pleural Effusion": [0, 1, -1][i % 3],  # one row carries -1
            "Support Devices": 0,
        })
    for split in ("train", "eval", "test"):
        pd.DataFrame(rows).to_csv(root / f"{split}.csv", index=False)


@pytest.mark.slow
def test_builder_dataset_train_roundtrip(tmp_path):
    _make_fake_mimic_tree(tmp_path)
    builder = TensorDatasetBuilder(str(tmp_path), str(tmp_path / "out"), img_size=64)
    builder()
    base = tmp_path / "out" / "files_small_64"
    assert (base / "train_pa.npy").exists()
    labels = pd.read_csv(base / "train_labels.csv")
    assert "Finding" in labels.columns  # derived binary label
    assert np.load(base / "train_pa.npy").shape == (6, 64, 64)

    # word-encoded dataset: vocab gets built from train findings + persisted
    cfg = MopoeConfig(
        dataset="Mimic", dir_data=str(tmp_path / "out"), img_size=64,
        text_encoding="word", word_min_occ=0, batch_size=2,
        class_dim=4, DIM_img=2, DIM_text=2, compute_dtype="float32",
    )
    ds = MimicDataset(cfg, split="train")
    # -1-label rows filtered (2 of 6 rows have -1 in Pleural Effusion)
    assert len(ds) == 4
    sample, label = ds[0]
    assert sample["PA"].shape == (64, 64, 1)
    assert sample["text"].dtype == np.int32
    assert label.shape == (3,)
    vocab_size = ds.vocab.vocab_size
    assert vocab_size > 10

    # char-encoded variant uses the native batch codec
    cfg_c = cfg.replace(text_encoding="char")
    ds_c = MimicDataset(cfg_c, split="train")
    batch_c, _ = next(iter(BatchLoader(ds_c, 2, shuffle=False)))
    assert batch_c["text"].shape == (2, 1024, 71)
    assert float(batch_c["text"].sum(axis=-1).min()) == 1.0  # one-hot rows

    # one real train step through the loader (word mode)
    import jax

    from mopoe_mimic_tpu.train import create_train_state, make_train_step

    cfg = cfg.replace(vocab_size=vocab_size)
    loader = BatchLoader(ds, cfg.batch_size, shuffle=True, seed=0)
    batch0, _ = next(iter(loader))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch0)
    step = make_train_step(cfg)
    state, metrics = step(state, batch0)
    assert np.isfinite(float(metrics["total_loss"]))

    # toy set + dataset stats utilities
    create_toy_set(str(tmp_path / "out"), 64, n=2)
    assert (tmp_path / "out" / "toy_files_small_64" / "train_pa.npy").exists()
    stats = dataset_stats(str(tmp_path / "out"), 64)
    assert 0.0 < stats["pa_mean"] < 1.0

    # cfg.use_toy_dataset reads the toy slice (toy_files_small_*)
    cfg_toy = cfg.replace(use_toy_dataset=True)
    ds_toy = MimicDataset(cfg_toy, "train")
    assert len(ds_toy) <= 2
    s, _ = ds_toy[0]
    np.testing.assert_allclose(s["PA"], ds[0][0]["PA"], atol=1e-7)


def test_uint8_store_matches_float_store(tmp_path):
    """store_uint8 (default) is lossless vs the float32 store (float ==
    uint8/255) and passes raw uint8 through when cfg.transfer_uint8."""
    _make_fake_mimic_tree(tmp_path)
    TensorDatasetBuilder(str(tmp_path), str(tmp_path / "u8"), img_size=64)()
    TensorDatasetBuilder(str(tmp_path), str(tmp_path / "f32"), img_size=64,
                         store_uint8=False)()
    u8 = np.load(tmp_path / "u8" / "files_small_64" / "train_pa.npy")
    f32 = np.load(tmp_path / "f32" / "files_small_64" / "train_pa.npy")
    assert u8.dtype == np.uint8 and f32.dtype == np.float32
    np.testing.assert_allclose(u8.astype(np.float32) / 255.0, f32, atol=1e-7)
    assert u8.nbytes * 4 == f32.nbytes

    base_cfg = dict(dataset="Mimic", img_size=64, text_encoding="char",
                    batch_size=2, class_dim=4, DIM_img=2, DIM_text=2,
                    compute_dtype="float32")
    ds_u8 = MimicDataset(MopoeConfig(dir_data=str(tmp_path / "u8"), **base_cfg), "train")
    ds_f32 = MimicDataset(MopoeConfig(dir_data=str(tmp_path / "f32"), **base_cfg), "train")
    s_u8, _ = ds_u8[0]
    s_f32, _ = ds_f32[0]
    assert s_u8["PA"].dtype == np.float32  # host dequant without transfer_uint8
    np.testing.assert_allclose(s_u8["PA"], s_f32["PA"], atol=1e-7)

    # the loader contract is float [0,1] regardless of transfer_uint8 —
    # every consumer (clf trainer, representation/likelihood evals) sees
    # the same scale; only the explicit compact paths carry uint8
    cfg_t = MopoeConfig(dir_data=str(tmp_path / "u8"), transfer_uint8=True, **base_cfg)
    ds_t = MimicDataset(cfg_t, "train")
    s_t, _ = ds_t[0]
    assert s_t["PA"].dtype == np.float32 and float(s_t["PA"].max()) <= 1.0
    batch, _ = next(iter(BatchLoader(ds_t, 2, shuffle=False)))
    assert batch["PA"].dtype == np.float32 and batch["PA"].shape == (2, 64, 64, 1)

    # prefetch quantization re-creates the on-disk bytes exactly
    from mopoe_mimic_tpu.parallel.prefetch import quantize_batch_uint8

    q = quantize_batch_uint8(batch)
    assert q["PA"].dtype == np.uint8
    np.testing.assert_array_equal(q["PA"][0, ..., 0], u8[ds_t.row_index[0]])

    # DeviceStore's compact accessor is byte-exact (no float round-trip)
    raw = ds_t.image_uint8("PA", np.arange(2))
    assert raw.dtype == np.uint8 and raw.shape == (2, 64, 64, 1)
    np.testing.assert_array_equal(raw[0, ..., 0], u8[ds_t.row_index[0]])
