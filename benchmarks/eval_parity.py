"""Whole-suite eval parity on SHARED weights (VERDICT r4 #2).

Runs the reference's ACTUAL test()-stack (mimic/run_epochs.py:190-219 →
eval_metrics/representation.py, coherence.py, likelihood.py — the real
loaded modules, not re-implementations) and this framework's
evaluation/runner.run_eval_suite on the SAME trained checkpoint
(imported via models/torch_import.convert_mopoe_state_dict), the SAME
test data (the structured-noise synthetic store, byte-identical on both
sides), and the SAME classifier functions (this framework's trained
flax classifiers, wrapped as torch callables for the reference stack —
so coherence deltas isolate GENERATION+EVAL semantics, not classifier
training), then tabulates metric-by-metric deltas.

Stochasticity control: encoders are deterministic, so lr-eval deltas
reflect only LR-fit differences. Conditional generation samples
z ~ q(z|x) with each stack's own RNG — `--det-z` pins z = mu on BOTH
sides, making conditional samples deterministic given the weights
(tight deltas; this is the mode that catches eval-semantics drift).
Random generation and IWAE keep their own sampling → statistical
tolerances.

Usage (CPU-forced; stages serialize on the 1-core box):
  python benchmarks/eval_parity.py --stage ref  [--det-z]
  python benchmarks/eval_parity.py --stage ours [--det-z]
  python benchmarks/eval_parity.py --report
Consumes the race checkpoint /tmp/race/race_torch_s0.pt (or --ckpt).
Writes /tmp/eval_parity/{ref,ours}[_detz].json and, for --report,
docs/EVAL_PARITY.json + a markdown table to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT_DIR = "/tmp/eval_parity"
EVAL_BS = 30  # the reference test() forces batch 30 (run_epochs.py:188)
LABELS = ["Lung Opacity", "Pleural Effusion", "Support Devices"]

from convergence_race import RACE, make_cfg, make_datasets  # noqa: E402


def _force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mopoe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


CLF_EPOCHS = 6


def _race_cfg(det_z: bool):
    cfg = make_cfg(seed=0, epochs=1)
    # det_z is applied by monkeypatching reparameterize on each side, not
    # via config — both stacks keep their production configuration
    # clf_quick_epochs: the classifiers are SHARED infrastructure (same
    # function on both sides), so a fixed modest training budget is
    # enough — their absolute quality is not under test
    return cfg.replace(
        eval_lr=True, use_clf=True, calc_nll=True, calc_prd=False,
        eval_batch_size=EVAL_BS, num_imp_samples=6,
        clf_quick_epochs=CLF_EPOCHS,
        dir_clf="/tmp/race_clf",  # default ../clf would land outside /tmp
    )


def _our_experiment(det_z: bool):
    """Our Experiment on the race fixture, state carrying the torch
    checkpoint's weights."""
    from mopoe_mimic_tpu.experiment import Experiment

    cfg = _race_cfg(det_z)
    return Experiment(cfg), cfg


def _import_state(exp, cfg, ckpt_path):
    import jax
    import torch

    from mopoe_mimic_tpu.models.torch_import import convert_mopoe_state_dict

    sd = torch.load(ckpt_path, map_location="cpu")
    conv = convert_mopoe_state_dict(sd, cfg)
    state = exp.init_state(jax.random.PRNGKey(0))
    return state.replace(params=conv["params"], batch_stats=conv["batch_stats"])


# ---------------------------------------------------------------------------
# ours
# ---------------------------------------------------------------------------

def run_ours(ckpt_path: str, det_z: bool, out_path: str):
    _force_cpu()
    from mopoe_mimic_tpu.evaluation.runner import run_eval_suite

    exp, cfg = _our_experiment(det_z)
    state = _import_state(exp, cfg, ckpt_path)
    if det_z:
        import mopoe_mimic_tpu.models.mmvae as mmvae_mod

        mmvae_mod.reparameterize = lambda rng, mu, lv: mu
    results = run_eval_suite(exp, state, epoch=0)
    results.pop("timings", None)
    exp.drain_host_jobs()
    with open(out_path, "w") as f:
        json.dump(_tofloat(results), f, indent=2, default=float)
    print("ours done →", out_path)


# ---------------------------------------------------------------------------
# reference stack
# ---------------------------------------------------------------------------

class _TorchDS:
    """torch-Dataset view of the synthetic store (reference batch schema:
    NCHW float images, int64 word ids, float labels)."""

    def __init__(self, ds):
        import torch

        self.cols = ds.arrays
        self.labels_arr = ds.labels
        self._torch = torch

    def __len__(self):
        return len(self.labels_arr)

    def __getitem__(self, i):
        t = self._torch
        return (
            {
                "PA": t.from_numpy(self.cols["PA"][i].transpose(2, 0, 1).copy()),
                "Lateral": t.from_numpy(
                    self.cols["Lateral"][i].transpose(2, 0, 1).copy()),
                "text": t.from_numpy(
                    np.asarray(self.cols["text"][i], dtype=np.int64)),
            },
            t.from_numpy(self.labels_arr[i]),
        )


class _WrappedClf:
    """This framework's jitted flax classifier as a torch callable — the
    SAME classifier function on both sides of the parity table."""

    def __init__(self, fn, kind):
        self.fn, self.kind = fn, kind

    def to(self, device):
        return self

    def __call__(self, x):
        import torch

        arr = x.detach().cpu().numpy()
        if self.kind == "img":
            arr = arr.transpose(0, 2, 3, 1)  # NCHW → NHWC
        else:
            if arr.ndim == 3:  # [B, L, V] distribution → ids
                arr = arr.argmax(-1)
            arr = arr.astype(np.int32)
        return torch.from_numpy(np.asarray(self.fn(arr), dtype=np.float32))


def run_ref(ckpt_path: str, det_z: bool, out_path: str):
    _force_cpu()  # the wrapped flax classifiers run jax-on-CPU here
    import torch

    import ref_harness as H

    ref = H.load_reference()
    ev = H.load_reference_eval(ref)

    # sklearn >=1.7 removed LogisticRegression(multi_class=...) — the
    # reference passes 'auto', which is the only (and default) behavior
    # now, so swallowing the kwarg is semantics-preserving
    from sklearn.linear_model import LogisticRegression as _LR

    def _compat_lr(**k):
        k.pop("multi_class", None)
        return _LR(**k)

    ev.representation.LogisticRegression = _compat_lr
    flags = H.make_flags(RACE["method"], dim=RACE["dim"],
                         class_dim=RACE["class_dim"],
                         img_size=RACE["img_size"],
                         vocab_size=RACE["vocab_size"],
                         len_sequence=RACE["len_sequence"],
                         batch_size=EVAL_BS, lr=RACE["lr"])
    # eval-stack flags (reference defaults / test()-time values)
    flags.distributed = False
    flags.dataloader_workers = 0
    flags.steps_per_training_epoch = -1
    flags.num_training_samples_lr = 500
    flags.dataset = "testing_structured"
    flags.verbose = 0
    flags.num_samples_fid = 0
    flags.save_figure = False
    flags.binary_labels = False
    flags.world_size = 1

    model, mods, exp = H.build_model(ref, flags, seed=0)
    model.load_state_dict(torch.load(ckpt_path, map_location="cpu"))
    model.eval()

    if det_z:
        ref.utils.reparameterize = lambda mu, logvar: mu

    cfg = _race_cfg(det_z)
    train_ds, test_ds = make_datasets(cfg)

    # shared classifiers: load/train OUR flax classifiers on the SAME
    # fixture (cached by dataset fingerprint), wrap for torch
    our_exp, _ = _our_experiment(det_z)
    from mopoe_mimic_tpu.evaluation.clf_loader import load_or_train_classifiers

    evaluator = load_or_train_classifiers(our_exp)
    clfs = {
        "PA": _WrappedClf(evaluator.clf_predict["PA"], "img"),
        "Lateral": _WrappedClf(evaluator.clf_predict["Lateral"], "img"),
        "text": _WrappedClf(evaluator.clf_predict["text"], "text"),
    }

    # the eval-stack experiment shim (MimicExperiment surface used by
    # representation/coherence/likelihood — experiment.py:60-225)
    from sklearn.metrics import average_precision_score

    exp.mm_vae = model
    exp.dataset_train = _TorchDS(train_ds)
    exp.dataset_test = _TorchDS(test_ds)
    exp.labels = list(LABELS)
    exp.clfs = clfs
    exp.clf_transforms = {m: (lambda x: x) for m in mods}
    exp.eval_metric = average_precision_score
    exp.eval_label = (
        lambda values, labels, index=None:
        exp.eval_metric(np.asarray(labels)[:, index], np.asarray(values)[:, index]))
    exp.mean_eval_metric = lambda values: np.mean(np.array(values))
    exp.subsets = {k: v for k, v in model.subsets.items() if k}
    exp.flags.verbose = 0
    # word-id → token bijection for tensor_to_text/BLEU (the real i2w is
    # a vocab file; any bijection preserves n-gram identity)
    exp.dataset_train.report_findings_dataset = SimpleNamespace(
        i2w={str(i): f"w{i}" for i in range(RACE["vocab_size"])})

    torch.manual_seed(0)
    np.random.seed(0)

    results = {}
    with torch.no_grad():
        clf_lr = ev.representation.train_clf_lr_all_subsets(exp)
        results["lr_eval"] = ev.representation.test_clf_lr_all_subsets(clf_lr, exp)
        gen_eval, text_gen_eval = ev.coherence.test_generation(exp)
        results["gen_eval"] = gen_eval
        results["text_gen_eval"] = text_gen_eval
        results["likelihoods"] = ev.likelihood.estimate_likelihoods(exp)

    with open(out_path, "w") as f:
        json.dump(_tofloat(results), f, indent=2, default=float)
    print("ref done →", out_path)


# ---------------------------------------------------------------------------
# report
# ---------------------------------------------------------------------------

def _tofloat(x):
    import torch

    if isinstance(x, dict):
        return {str(k): _tofloat(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_tofloat(v) for v in x]
    if isinstance(x, torch.Tensor):
        return x.item() if x.numel() == 1 else x.tolist()
    if isinstance(x, (np.generic, np.ndarray)):
        return float(x) if np.ndim(x) == 0 else np.asarray(x).tolist()
    return x


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        elif isinstance(v, (int, float)):
            out[key] = float(v)
    return out


def report():
    rows = []
    for suffix in ("", "_detz"):
        pr, po = (os.path.join(OUT_DIR, f"ref{suffix}.json"),
                  os.path.join(OUT_DIR, f"ours{suffix}.json"))
        if not (os.path.exists(pr) and os.path.exists(po)):
            continue
        with open(pr) as f:
            ref = _flatten(json.load(f))
        with open(po) as f:
            ours = _flatten(json.load(f))
        rows.append((suffix or "_sampled", ref, ours))
    if not rows:
        print("no artifacts in", OUT_DIR)
        return
    report_obj = {}
    for mode, ref, ours in rows:
        matched = {}
        for k, rv in sorted(ref.items()):
            ok = _match_key(k, ours)
            if ok is not None:
                matched[k] = {"ref": rv, "ours": ours[ok],
                              "delta": ours[ok] - rv}
        report_obj[mode] = matched
        report_obj[mode + "_summary"] = _summarize(matched)
        print(f"\n## eval parity ({mode})")
        print(f"{'metric':60s} {'torch-ref':>12s} {'ours':>12s} {'Δ':>10s}")
        for k, v in matched.items():
            print(f"{k:60s} {v['ref']:12.4f} {v['ours']:12.4f} "
                  f"{v['delta']:10.4f}")
        print(json.dumps(report_obj[mode + "_summary"], indent=2))
    with open(os.path.join(REPO, "docs", "EVAL_PARITY.json"), "w") as f:
        json.dump(report_obj, f, indent=2)
    print("\nwrote docs/EVAL_PARITY.json")


def _summarize(matched: dict) -> dict:
    """Aggregate deltas per family, SEPARATING the documented upstream
    deviations (PARITY.md deviations table) from the true parity signal:

    - bleu*: the reference mis-nests corpus_bleu references (each token
      becomes a character-sequence reference, coherence.py:302-310) so
      its BLEU is ~0 regardless of the text; ours is real token BLEU.
    - lr_eval mean_AP: the reference swaps average_precision_score
      argument order (classifiers/utils.py:393-400).
    - likelihoods: the reference regroups importance weights B-major so
      each datapoint's logmeanexp mixes OTHER datapoints' samples at
      B>1, and duplicates one modality's style posterior
      (utils/likelihood.py:138/218, :50-52); ours computes the correct
      estimator (golden-pinned equal at B=1 where the bug vanishes,
      tests/test_golden_mmvae_core.py).
    - lr_eval counts/threshold metrics: fit-implementation difference
      (sklearn lbfgs vs our jitted full-batch-Adam ridge, same C=1
      objective) — bounded drift, not eval-semantics; the convergence
      race pins AP equivalence with a SHARED sklearn evaluator.
    """
    fams = {}
    for k, v in matched.items():
        top = k.split("/")[0]
        leaf = k.rsplit("/", 1)[-1]
        if leaf.startswith("bleu"):
            fam = "bleu [documented deviation: nltk misuse upstream]"
        elif top == "lr_eval" and "mean_AP" in k:
            fam = "lr_eval mean_AP [documented deviation: swapped args upstream]"
        elif top == "likelihoods":
            fam = "likelihoods [documented deviation: K/B regrouping upstream]"
        elif top == "lr_eval" and ("count" in leaf):
            fam = "lr_eval counts [LR-fit impl difference]"
        elif top == "lr_eval":
            fam = "lr_eval threshold metrics [LR-fit impl difference]"
        else:
            fam = top  # gen_eval coherence, text common words — parity signal
        fams.setdefault(fam, []).append(abs(v["delta"]))
    return {
        fam: {"n": len(vals),
              "mean_abs_delta": round(float(np.mean(vals)), 5),
              "max_abs_delta": round(float(np.max(vals)), 5)}
        for fam, vals in sorted(fams.items())
    }


def _match_key(ref_key, ours: dict):
    """Map the reference's nested metric path to our flattened key
    (run_eval_suite returns flatten_metrics-style underscore keys)."""
    parts = ref_key.split("/")
    cand = None
    if parts[0] == "lr_eval":
        cand = "lr_eval_" + "_".join(parts[1:])
    elif parts[0] == "gen_eval" and parts[1] == "random":
        cand = f"gen_eval_random_coherence_{parts[2]}"
    elif parts[0] == "gen_eval" and parts[1] == "cond":
        cand = "gen_eval_cond_coherence_" + "_".join(parts[2:])
    elif parts[0] == "text_gen_eval":
        m = parts[-1]
        if m.startswith("bleu") and len(m) == 5:  # bleu1..bleu4 → bleu_1..
            m = f"bleu_{m[4]}"
        cand = "gen_eval_text_gen_" + "_".join(parts[1:-1]) + f"_{m}"
    elif parts[0] == "likelihoods":
        cand = "likelihoods_" + "_".join(parts[1:])
    else:
        cand = ref_key.replace("/", "_")
    return cand if cand in ours else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["ref", "ours"])
    ap.add_argument("--det-z", action="store_true")
    ap.add_argument("--ckpt", default="/tmp/race/race_torch_s0.pt")
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny fixture (128 train samples, 1 clf epoch) — "
                    "pipeline shakeout only; pair with a --smoke race ckpt")
    args = ap.parse_args()
    if args.smoke:
        global CLF_EPOCHS, OUT_DIR
        RACE["n_train"] = 128
        CLF_EPOCHS = 1
        OUT_DIR = OUT_DIR + "_smoke"
    os.makedirs(OUT_DIR, exist_ok=True)
    if args.report:
        report()
        return
    suffix = "_detz" if args.det_z else ""
    out = os.path.join(OUT_DIR, f"{args.stage}{suffix}.json")
    if args.stage == "ref":
        run_ref(args.ckpt, args.det_z, out)
    else:
        run_ours(args.ckpt, args.det_z, out)


if __name__ == "__main__":
    main()
