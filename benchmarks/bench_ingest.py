"""Ingest-throughput measurement (VERDICT r2 #1 done-criterion).

Two measurements, printed as JSON lines:

1. **Metadata join at TRUE 65k-study scale** — fabricates the three
   MIMIC-CXR distribution CSVs with ``--studies`` studies (default 65,000,
   the post-filter train-split scale from SURVEY.md §6) and times
   ``build_join`` (view pairing + split mapping + CheXpert merge; report
   parsing excluded here and measured per-study below). No images needed.

2. **Image pipeline throughput** — fabricates ``--images`` real JPEGs
   (default 400), times resize-cache (center-crop + LANCZOS + JPEG encode)
   and store-write (JPEG decode → uint8 memmap row) stages, reporting
   imgs/sec each, plus report-parse docs/sec. The projected full-build
   wall-clock for 65k studies × 2 views is derived from the measured
   rates.

Usage: python benchmarks/bench_ingest.py [--studies N] [--images N] [--workers N]
"""

import argparse
import gzip
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mopoe_mimic_tpu.data.mimic_ingest import (  # noqa: E402
    MimicIngest, build_join, parse_report,
)

REPORT = """FINAL REPORT
 FINDINGS:
 The lungs are clear without focal consolidation. No pleural effusion or
 pneumothorax is seen. Case {k}.

 IMPRESSION:
 No acute cardiopulmonary abnormality.
"""


def fabricate_csvs(root: Path, n_studies: int) -> None:
    ks = np.arange(n_studies)
    subjects = 10_000_000 + ks
    studies = 50_000_000 + ks
    splits = np.where(ks % 10 == 8, "validate",
                      np.where(ks % 10 == 9, "test", "train"))
    meta, spl = [], []
    for v_i, view in enumerate(("PA", "LATERAL")):
        meta.append(pd.DataFrame({
            "dicom_id": [f"d{k}_{v_i}" for k in ks],
            "subject_id": subjects, "study_id": studies,
            "ViewPosition": view,
        }))
        spl.append(pd.DataFrame({
            "dicom_id": [f"d{k}_{v_i}" for k in ks],
            "study_id": studies, "subject_id": subjects, "split": splits,
        }))
    chex = pd.DataFrame({
        "subject_id": subjects, "study_id": studies,
        "Lung Opacity": (ks % 3 == 0).astype(float),
        "Pleural Effusion": (ks % 5 == 0).astype(float),
        "Support Devices": 0.0,
    })
    for stem, df in (
        ("mimic-cxr-2.0.0-metadata", pd.concat(meta)),
        ("mimic-cxr-2.0.0-split", pd.concat(spl)),
        ("mimic-cxr-2.0.0-chexpert", chex),
    ):
        with gzip.open(root / f"{stem}.csv.gz", "wt") as f:
            df.to_csv(f, index=False)


def fabricate_images(root: Path, n_studies: int) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    for k in range(n_studies):
        subject, study = 10_000_000 + k, 50_000_000 + k
        d = root / "files" / f"p{str(subject)[:2]}" / f"p{subject}" / f"s{study}"
        d.mkdir(parents=True, exist_ok=True)
        (d.parent / f"s{study}.txt").write_text(REPORT.format(k=k))
        for v_i in range(2):
            arr = (rng.random((390, 320)) * 255).astype(np.uint8)
            Image.fromarray(arr, mode="L").save(d / f"d{k}_{v_i}.jpg")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--studies", type=int, default=65000)
    ap.add_argument("--images", type=int, default=400)
    ap.add_argument("--workers", type=int, default=1)
    args = ap.parse_args()

    # --- 1. join at full scale (no images) -------------------------------
    with tempfile.TemporaryDirectory() as d:
        root = Path(d)
        fabricate_csvs(root, args.studies)
        t0 = time.perf_counter()
        frames = build_join(str(root), read_reports=False)
        dt = time.perf_counter() - t0
        n = sum(len(f) for f in frames.values())
        print(json.dumps({
            "metric": "ingest_join_studies_per_sec",
            "value": round(n / dt, 1), "unit": "studies/sec",
            "studies": n, "join_s": round(dt, 2),
        }))

    # --- 2. image + report pipeline throughput ---------------------------
    with tempfile.TemporaryDirectory() as d:
        root = Path(d)
        n_img_studies = args.images // 2
        fabricate_csvs(root, n_img_studies)
        fabricate_images(root, n_img_studies)

        texts = [REPORT.format(k=k) for k in range(2000)]
        t0 = time.perf_counter()
        for t in texts:
            parse_report(t)
        parse_rate = len(texts) / (time.perf_counter() - t0)

        ingest = MimicIngest(str(root), str(root / "out"), img_size=128,
                             workers=args.workers)
        ingest()
        resize_s = sum(v for k, v in ingest.stats.items() if k.endswith("resize_s"))
        store_s = sum(v for k, v in ingest.stats.items() if k.endswith("store_s"))
        n_imgs = n_img_studies * 2
        resize_rate = n_imgs / resize_s
        store_rate = n_imgs / store_s
        # projected 65k-study build (2 views/study), dominated by resize
        projected_min = (65000 * 2) * (1 / resize_rate + 1 / store_rate) / 60
        print(json.dumps({
            "metric": "ingest_image_pipeline",
            "resize_imgs_per_sec": round(resize_rate, 1),
            "store_imgs_per_sec": round(store_rate, 1),
            "report_parse_docs_per_sec": round(parse_rate, 1),
            "workers": args.workers,
            "projected_65k_build_min": round(projected_min, 1),
        }))


if __name__ == "__main__":
    main()
