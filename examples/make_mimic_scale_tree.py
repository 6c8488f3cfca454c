"""Fabricate a MIMIC-CXR-JPG-layout raw tree at MIMIC scale.

Produces the exact v2.0.0 distribution layout ``mimic_ingest`` consumes —
metadata/split/chexpert CSVs (.csv.gz), per-study report ``.txt`` files
with FINDINGS/IMPRESSION sections, and ``files/p##/p<subject>/s<study>/
<dicom>.jpg`` images — with *learnable* cross-modal structure (the
``testing_structured`` contract at dataset scale): every study carries a
latent class c; both views show a bright band whose position encodes c,
the report findings use class-specific vocabulary, and the CheXpert
labels derive from c. A small fraction of rows carries a -1 'uncertain'
label to exercise the dataset filter, and the split follows MIMIC's
train/validate/test proportions.

This is the input for the round-3 rehearsal (VERDICT r2 #8): raw tree →
mimic_ingest (measured at true 65k-study scale) → MimicDataset →
device-resident flagship training with full metrics.

Usage:
    python examples/make_mimic_scale_tree.py --out /tmp/mimic_raw \
        --studies 65000 [--jpg_size 160] [--classes 6]
"""

import argparse
import gzip
import os
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLASS_SENTENCES = [
    "the lungs are clear without focal consolidation or effusion",
    "there is a dense opacity in the left lower lobe concerning for pneumonia",
    "small bilateral pleural effusions with mild pulmonary edema are seen",
    "support devices are in standard position endotracheal tube unchanged",
    "cardiomegaly is moderate with vascular congestion and cephalization",
    "no pneumothorax fracture or acute osseous abnormality identified",
]
FILLER = [
    "comparison is made to the prior study", "no interval change",
    "the mediastinal contours are unremarkable", "bony structures intact",
    "portable upright view obtained", "limited by patient rotation",
]
REPORT_TPL = """                                 FINAL REPORT
 EXAMINATION:  CHEST (PA AND LAT)

 FINDINGS:
 {findings}

 IMPRESSION:
 {impression}
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--studies", type=int, default=65000)
    ap.add_argument("--jpg_size", type=int, default=160,
                    help="fabricated JPEG side (real MIMIC is ~2500-3000)")
    ap.add_argument("--classes", type=int, default=6)
    ap.add_argument("--uncertain_frac", type=float, default=0.02)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="per-channel corruption prob (image band / report "
                    "vocab / labels each independently follow a random "
                    "class instead of the true one) — de-saturates "
                    "lr-eval/coherence so the metrics can rank model "
                    "quality instead of pinning at 1.0 (VERDICT r3 #4)")
    args = ap.parse_args()
    from PIL import Image

    root = Path(args.out)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    n = args.studies
    classes = rng.integers(0, args.classes, size=n)
    # MIMIC-like split proportions: ~93% train / ~3.5% validate / ~3.5% test
    u = rng.random(n)
    split = np.where(u < 0.93, "train", np.where(u < 0.965, "validate", "test"))

    meta_rows, split_rows, chex_rows = [], [], []
    t0 = time.perf_counter()
    s = args.jpg_size
    band = s // (args.classes + 1)
    for k in range(n):
        subject = 10_000_000 + k
        study = 50_000_000 + k
        c = int(classes[k])
        rel = Path(f"p{str(subject)[:2]}") / f"p{subject}" / f"s{study}"
        d = root / "files" / rel
        d.mkdir(parents=True, exist_ok=True)

        def corrupted() -> int:
            # independent per-channel corruption (SyntheticMimic noise
            # contract): with prob --noise this channel follows a random
            # class instead of the true one
            if args.noise and rng.random() < args.noise:
                return int(rng.integers(0, args.classes))
            return c

        # report: class sentence + two fillers (stable, learnable vocab)
        fillers = rng.choice(FILLER, size=2, replace=False)
        c_text = corrupted()
        findings = f"{CLASS_SENTENCES[c_text]}. {fillers[0]}. {fillers[1]}."
        (root / "files" / rel.parent / f"s{study}.txt").write_text(
            REPORT_TPL.format(findings=findings,
                              impression=CLASS_SENTENCES[c_text])
        )

        # two views: bright band position encodes the class (view-offset
        # like SyntheticMimic structured)
        for v_i, view in enumerate(("PA", "LATERAL")):
            arr = (rng.random((s, s)) * 25).astype(np.uint8)
            top = ((corrupted() + v_i) % args.classes) * band + band // 2
            arr[top : top + band] = np.minimum(
                arr[top : top + band].astype(np.int32) + 200, 255
            ).astype(np.uint8)
            dicom = f"d{k}_{v_i}"
            Image.fromarray(arr, mode="L").save(d / f"{dicom}.jpg", quality=90)
            meta_rows.append((dicom, subject, study, view))
            split_rows.append((dicom, study, subject, split[k]))

        # labels from the class; a small fraction 'uncertain' (-1)
        lbl = {name: 0.0 for name in
               ("Lung Opacity", "Pleural Effusion", "Support Devices")}
        lbl[list(lbl)[corrupted() % 3]] = 1.0
        if rng.random() < args.uncertain_frac:
            lbl["Pleural Effusion"] = -1.0
        chex_rows.append({"subject_id": subject, "study_id": study, **lbl})
        if k and k % 10000 == 0:
            rate = k / (time.perf_counter() - t0)
            print(f"fabricated {k}/{n} studies ({rate:.0f}/s)", flush=True)

    meta = pd.DataFrame(meta_rows, columns=["dicom_id", "subject_id",
                                            "study_id", "ViewPosition"])
    spl = pd.DataFrame(split_rows, columns=["dicom_id", "study_id",
                                            "subject_id", "split"])
    chex = pd.DataFrame(chex_rows)
    for stem, df in (("mimic-cxr-2.0.0-metadata", meta),
                     ("mimic-cxr-2.0.0-split", spl),
                     ("mimic-cxr-2.0.0-chexpert", chex)):
        with gzip.open(root / f"{stem}.csv.gz", "wt") as f:
            df.to_csv(f, index=False)
    print(f"done: {n} studies in {(time.perf_counter() - t0) / 60:.1f} min "
          f"→ {root}")


if __name__ == "__main__":
    main()
