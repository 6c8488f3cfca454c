"""Exploration toolkit — script-form parity for the reference's notebooks
(mimic/notebooks/: model_exploration, data_loader_vis; SURVEY.md §2.6).
The reference ships these as ipynb with no runtime behavior; here the same
inspections are reproducible CLI commands over the framework's own APIs.

  python examples/explore.py data  --config CFG.json --out DIR
      Dataset visualization: per-modality sample grids, decoded text
      samples, label distribution CSV, report-length statistics.

  python examples/explore.py model --run_dir RUN --out DIR
      Trained-model exploration: random-generation grids, full-subset
      reconstructions next to their inputs, a latent-traversal sheet
      (one row per latent dim, swept -3..3σ through the decoder), and a
      per-subset posterior-statistics CSV.

Both commands work on any dataset the framework supports (synthetic /
ingested MIMIC); `model` restores the run's best checkpoint through
serve.InferenceSession, so it runs on exactly what would be deployed.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mopoe_mimic_tpu.config import MopoeConfig  # noqa: E402
from mopoe_mimic_tpu.data.loader import BatchLoader  # noqa: E402
from mopoe_mimic_tpu.experiment import Experiment  # noqa: E402
from mopoe_mimic_tpu.utils.logger import log  # noqa: E402
from mopoe_mimic_tpu.utils.save_samples import (  # noqa: E402
    write_samples_img_to_file, write_samples_text_to_file,
)


def _load_cfg(path: str) -> MopoeConfig:
    with open(path) as f:
        raw = json.load(f)
    known = {f.name for f in MopoeConfig.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    return MopoeConfig(**{k: v for k, v in raw.items() if k in known})


def _decode_texts(exp: Experiment, text: np.ndarray, n: int):
    from mopoe_mimic_tpu.data.text_codec import tensor_to_text

    i2w = getattr(getattr(exp.dataset_test, "vocab", None), "i2w", None)
    one_hot = text.ndim == 3
    if exp.cfg.text_encoding == "word":
        if i2w is None:  # synthetic word data has no real vocabulary
            ids = np.argmax(text, -1) if one_hot else text
            return [[f"<{int(t)}>" for t in row[:24]] for row in ids[:n]]
        return tensor_to_text(text[:n], one_hot=one_hot, i2w=i2w)
    rows = tensor_to_text(text[:n], one_hot=one_hot)
    return [["".join(r)] for r in rows]


# ---------------------------------------------------------------------------
# data — dataio/notebook data_loader_vis parity
# ---------------------------------------------------------------------------

def explore_data(cfg: MopoeConfig, out_dir: str, n: int = 64) -> Dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    exp = Experiment(cfg, make_dirs=False)
    ds = exp.dataset_test
    batch, labels = next(iter(BatchLoader(ds, min(n, len(ds)), shuffle=True, seed=0)))
    wrote: Dict[str, str] = {}

    for m, arr in batch.items():
        arr = np.asarray(arr)
        if m == "text":
            fn = os.path.join(out_dir, "text_samples.txt")
            write_samples_text_to_file(_decode_texts(exp, arr, min(16, len(arr))), fn)
            wrote["text"] = fn
            # report-length stats (chars/words actually used, pre-padding;
            # word <pad>=1 — data/vocab.py SPECIALS — char pad '&' = 8)
            ids = arr.argmax(-1) if arr.ndim == 3 else arr
            pad_id = 1 if cfg.text_encoding == "word" else 8
            used = (ids != pad_id).sum(-1)
            with open(os.path.join(out_dir, "text_length_stats.json"), "w") as f:
                json.dump({
                    "mean": float(np.mean(used)), "median": float(np.median(used)),
                    "p95": float(np.percentile(used, 95)),
                    "max_sequence": int(cfg.len_sequence),
                }, f, indent=2)
        else:
            fn = os.path.join(out_dir, f"{m}_grid.png")
            write_samples_img_to_file(arr, fn)
            wrote[m] = fn

    # label distribution over the whole split (dataio label-count parity
    # checks — tests/test_dataset.py:18-22 in the reference)
    lab = np.asarray(ds.labels)
    fn = os.path.join(out_dir, "label_distribution.csv")
    with open(fn, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["label", "negatives", "positives", "pos_rate"])
        for i, name in enumerate(exp.labels):
            pos = int(lab[:, i].sum())
            w.writerow([name, len(lab) - pos, pos, round(pos / max(len(lab), 1), 4)])
    wrote["labels"] = fn
    log.info(f"dataset exploration written to {out_dir}: {sorted(wrote)}")
    return wrote


# ---------------------------------------------------------------------------
# model — notebook model_exploration parity
# ---------------------------------------------------------------------------

def explore_model(
    run_dir: str, out_dir: str, num_samples: int = 16,
    traverse_dims: int = 8, traverse_steps: int = 9, seed: int = 0,
) -> Dict[str, str]:
    from mopoe_mimic_tpu.serve import InferenceSession

    os.makedirs(out_dir, exist_ok=True)
    sess = InferenceSession(run_dir=run_dir)
    cfg = sess.cfg
    exp = Experiment(cfg, make_dirs=False)
    wrote: Dict[str, str] = {}

    # 1. random generation grids
    gen = sess.generate(num_samples, seed=seed)
    for m, arr in gen.items():
        if m == "text":
            fn = os.path.join(out_dir, "generated_text.txt")
            write_samples_text_to_file(_decode_texts(exp, arr, len(arr)), fn)
        else:
            fn = os.path.join(out_dir, f"generated_{m}.png")
            write_samples_img_to_file(arr, fn)
        wrote[f"gen_{m}"] = fn

    # 2. reconstructions: inputs next to their full-subset conditional
    #    regenerations
    bs = min(8, cfg.batch_size)
    batch, _ = next(iter(BatchLoader(exp.dataset_test, bs, shuffle=True, seed=seed)))
    full_key = "_".join(sorted(cfg.modality_names))
    recon = sess.cond_generate({k: np.asarray(v) for k, v in batch.items()},
                               seed=seed)[full_key]
    for m in cfg.modality_names:
        if m == "text":
            continue
        pair = np.concatenate([np.asarray(batch[m]), np.asarray(recon[m])])
        fn = os.path.join(out_dir, f"recon_{m}.png")
        write_samples_img_to_file(pair, fn, img_per_row=bs)
        wrote[f"recon_{m}"] = fn

    # 3. latent traversal: one row per latent dim, the dim swept over
    #    [-3, 3]σ with every other dim at 0 — decoded through the PA head
    dims = min(traverse_dims, cfg.class_dim)
    sweep = np.linspace(-3.0, 3.0, traverse_steps, dtype=np.float32)
    z = np.zeros((dims * traverse_steps, cfg.class_dim), np.float32)
    for d in range(dims):
        z[d * traverse_steps:(d + 1) * traverse_steps, d] = sweep

    def decode(params, stats, z):
        return sess.model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(z), None,
            train=False, rngs={"reparam": jax.random.PRNGKey(0)},
            method=lambda m, zc, st, train: m.generate_from_latents(
                zc, None, train=train),
        )
    frames = jax.device_get(
        jax.jit(decode)(sess.params, sess.batch_stats, z))
    for m, arr in frames.items():
        if m == "text":
            continue
        fn = os.path.join(out_dir, f"traversal_{m}.png")
        write_samples_img_to_file(np.asarray(arr), fn, img_per_row=traverse_steps)
        wrote[f"traversal_{m}"] = fn

    # 4. per-subset posterior statistics over a test batch
    lat = sess.encode({k: np.asarray(v) for k, v in batch.items()})
    fn = os.path.join(out_dir, "posterior_stats.csv")
    with open(fn, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["subset", "mean_abs_mu", "mean_logvar", "mean_kl_per_dim"])
        for key, (mu, lv) in sorted(lat["subsets"].items()):
            mu, lv = np.asarray(mu), np.asarray(lv)
            kl = 0.5 * (np.exp(lv) + mu ** 2 - 1.0 - lv)
            w.writerow([key, round(float(np.abs(mu).mean()), 5),
                        round(float(lv.mean()), 5),
                        round(float(kl.mean()), 5)])
    wrote["posterior_stats"] = fn
    log.info(f"model exploration written to {out_dir}: {sorted(wrote)}")
    return wrote


# ---------------------------------------------------------------------------

def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("data", help="dataset visualization")
    d.add_argument("--config", required=True, help="config JSON (a run's config.json works)")
    d.add_argument("--out", required=True)
    d.add_argument("--n", type=int, default=64)

    m = sub.add_parser("model", help="trained-model exploration")
    m.add_argument("--run_dir", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--num_samples", type=int, default=16)
    m.add_argument("--traverse_dims", type=int, default=8)
    m.add_argument("--seed", type=int, default=0)

    args = ap.parse_args(argv)
    if args.cmd == "data":
        explore_data(_load_cfg(args.config), args.out, n=args.n)
    else:
        explore_model(args.run_dir, args.out, num_samples=args.num_samples,
                      traverse_dims=args.traverse_dims, seed=args.seed)


if __name__ == "__main__":
    main()
