"""Raw-MIMIC ingestion end-to-end (VERDICT r2 #1): fabricate a
MIMIC-CXR-JPG v2.0.0-layout tree (distribution CSVs, CheXpert labels,
report .txt files, p##/p<subject>/s<study>/<dicom>.jpg images), run the
full join → resize-cache → store pipeline, and train a step from the
result through MimicDataset."""

import gzip
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from mopoe_mimic_tpu.data.mimic_ingest import (
    MimicIngest, build_join, parse_report,
)

REPORT = """                                 FINAL REPORT
 EXAMINATION:  CHEST (PA AND LAT)

 INDICATION:  Persistent cough.

 FINDINGS:
 The lungs are clear without focal consolidation.  No pleural effusion or
 pneumothorax is seen. {extra}

 IMPRESSION:
 No acute cardiopulmonary abnormality.
"""


def test_parse_report_sections():
    f, i = parse_report(REPORT.format(extra="Mild cardiomegaly."))
    assert f.startswith("The lungs are clear")
    assert "Mild cardiomegaly." in f
    assert "IMPRESSION" not in f
    assert i == "No acute cardiopulmonary abnormality."
    # missing sections → empty strings
    assert parse_report("EXAMINATION: chest") == ("", "")


def _make_raw_tree(root: Path, n_studies: int = 12):
    """MIMIC-CXR-JPG layout: distribution CSVs (.csv.gz), reports, JPEGs.
    Study 0 gets no Lateral view (join must drop it); study 1 has Lateral
    metadata but no image file (store stage must drop it)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    meta_rows, split_rows, chex_rows = [], [], []
    for k in range(n_studies):
        subject = 10000000 + k
        study = 50000000 + k
        split = ["train", "train", "train", "train", "validate", "validate",
                 "test", "test"][k % 8]
        views = ["PA", "LATERAL" if k != 0 else "AP"]  # study 0: no Lateral
        for v_i, view in enumerate(views):
            dicom = f"d{k:03d}{v_i}"
            meta_rows.append({
                "dicom_id": dicom, "subject_id": subject, "study_id": study,
                "ViewPosition": view,
            })
            split_rows.append({
                "dicom_id": dicom, "study_id": study, "subject_id": subject,
                "split": split,
            })
        chex_rows.append({
            "subject_id": subject, "study_id": study,
            "Lung Opacity": [1, 0, np.nan][k % 3],
            "Pleural Effusion": [0, 1, -1][k % 3],
            "Support Devices": 0.0,
            "Atelectasis": np.nan,
        })
        # report + images
        rel = Path(f"p{str(subject)[:2]}") / f"p{subject}" / f"s{study}"
        d = root / "files" / rel
        d.mkdir(parents=True, exist_ok=True)
        (root / "files" / rel.parent / f"s{study}.txt").write_text(
            REPORT.format(extra=f"Case {k}.")
        )
        for v_i, view in enumerate(views):
            if k == 1 and view != "PA":
                continue  # study 1: metadata says Lateral exists, jpg missing
            arr = (rng.random((90, 70)) * 255).astype(np.uint8)
            Image.fromarray(arr, mode="L").save(d / f"d{k:03d}{v_i}.jpg")

    for stem, rows in (
        ("mimic-cxr-2.0.0-metadata", meta_rows),
        ("mimic-cxr-2.0.0-split", split_rows),
        ("mimic-cxr-2.0.0-chexpert", chex_rows),
    ):
        with gzip.open(root / f"{stem}.csv.gz", "wt") as f:
            pd.DataFrame(rows).to_csv(f, index=False)


def test_build_join_view_pairing_and_splits(tmp_path):
    _make_raw_tree(tmp_path)
    frames = build_join(str(tmp_path))
    # study 0 (no Lateral) dropped by the inner join
    all_rows = pd.concat(frames.values())
    assert 50000000 not in set(all_rows["study_id"])
    # validate → eval mapping (k=4,5 validate; k=6,7 test; rest train)
    assert len(frames["eval"]) == 2 and len(frames["test"]) == 2
    assert len(frames["train"]) == 7  # 8 train studies minus study 0
    # reports parsed per study
    assert all_rows["findings"].str.startswith("The lungs are clear").all()
    assert (all_rows["impression"] == "No acute cardiopulmonary abnormality.").all()
    # CheXpert labels joined
    assert {"Lung Opacity", "Pleural Effusion", "Support Devices"} <= set(all_rows)


@pytest.mark.slow
def test_ingest_to_train_step(tmp_path):
    """Full pipeline: raw tree → MimicIngest → MimicDataset → one jitted
    train step (the VERDICT r2 #1 done-criterion)."""
    import jax

    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.mimic_dataset import MimicDataset
    from mopoe_mimic_tpu.train import create_train_state, make_train_step

    _make_raw_tree(tmp_path)
    out = tmp_path / "out"
    ingest = MimicIngest(str(tmp_path), str(out), img_size=64)
    n = ingest()
    # 12 studies - 1 (no Lateral view) - 1 (missing jpg) = 10 across splits
    assert sum(n.values()) == 10
    base = out / "files_small_64"
    pa = np.load(base / "train_pa.npy")
    assert pa.dtype == np.uint8 and pa.shape[1:] == (64, 64)
    labels = pd.read_csv(base / "train_labels.csv")
    assert "Finding" in labels.columns
    # Finding = sum(labels) > 0 (reference create_binary_labels semantics):
    # a row with Pleural Effusion=-1 and Lung Opacity NaN sums ≤ 0 → 0
    row_neg = labels[labels["Pleural Effusion"] == -1]
    assert (row_neg["Finding"] == 0).all()

    # resize cache is reused: second run does zero new resize work and
    # produces identical stores
    pa_before = pa.copy()
    MimicIngest(str(tmp_path), str(out), img_size=64)()
    np.testing.assert_array_equal(np.load(base / "train_pa.npy"), pa_before)

    cfg = MopoeConfig(
        dataset="Mimic", dir_data=str(out), img_size=64, text_encoding="word",
        word_min_occ=0, batch_size=2, class_dim=4, DIM_img=2, DIM_text=2,
        compute_dtype="float32",
    )
    ds = MimicDataset(cfg, split="train")
    assert len(ds) >= 1
    cfg = cfg.replace(vocab_size=ds.vocab.vocab_size)
    batch, _ = next(iter(BatchLoader(ds, 2, shuffle=False)))
    assert batch["PA"].dtype == np.float32 and batch["PA"].max() <= 1.0
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))


def test_ingest_parallel_workers_match_serial(tmp_path):
    """workers>1 (process pool) produces byte-identical stores."""
    _make_raw_tree(tmp_path)
    out1, out2 = tmp_path / "o1", tmp_path / "o2"
    MimicIngest(str(tmp_path), str(out1), img_size=64, workers=1)()
    MimicIngest(str(tmp_path), str(out2), img_size=64, workers=2)()
    for split in ("train", "eval", "test"):
        a = np.load(out1 / "files_small_64" / f"{split}_pa.npy")
        b = np.load(out2 / "files_small_64" / f"{split}_pa.npy")
        np.testing.assert_array_equal(a, b)


def test_fast_decode_matches_exact_within_one_gray_level(tmp_path):
    """_resize_one's JPEG draft-mode decode (fast_decode, the default)
    stays within 1/255 per pixel of the reference's full-resolution
    decode path on a realistic ~2500x3000 X-ray-shaped JPEG."""
    import numpy as np
    from PIL import Image

    from mopoe_mimic_tpu.data.mimic_ingest import _resize_one

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:764, 0:636]
    base = 120 + 80 * np.exp(-((yy - 380) ** 2 + (xx - 300) ** 2) / (2 * 170.0 ** 2))
    big = np.kron(np.clip(base + rng.normal(0, 8, base.shape), 0, 255), np.ones((4, 4)))
    src = tmp_path / "big.jpg"
    Image.fromarray(big.astype(np.uint8), "L").save(src, "JPEG", quality=90)

    fast_dst = tmp_path / "fast.jpg"
    exact_dst = tmp_path / "exact.jpg"
    assert _resize_one((str(src), str(fast_dst), 128, True))
    assert _resize_one((str(src), str(exact_dst), 128, False))
    a = np.asarray(Image.open(fast_dst), dtype=np.int16)
    b = np.asarray(Image.open(exact_dst), dtype=np.int16)
    assert a.shape == b.shape == (128, 128)
    # raw draft-vs-full delta is <=1 gray level; the cache's jpeg-95
    # re-encode spreads single-pixel deltas within DCT blocks, so bound
    # the post-re-encode distribution instead of the per-pixel max
    d = np.abs(a - b)
    assert d.mean() < 1.0
    assert np.percentile(d, 99) <= 2
    assert d.max() <= 8
