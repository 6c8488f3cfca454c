"""Round-2 full-metrics training run (VERDICT.md round-1 item 1).

Trains the flagship MoPoE on the STRUCTURED synthetic dataset (shared
latent class across all three modalities) with every heavy eval enabled at
full test-set coverage and convergence-trained coherence classifiers, then
writes the resulting reference-isomorphic metrics table to RESULTS_r2.md:
per-(subset) lr-eval metrics (representation.py:137-145), coherence AP per
(label, subset, modality) + random coherence + BLEU (coherence.py:204-311),
IWAE NLL per subset (likelihood.py:94-129), PRD.

Usage:
    python examples/long_run_r2.py --preset mini   # CPU smoke (~min)
    python examples/long_run_r2.py --preset full   # TPU run (~1-2 h)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mopoe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mopoe_mimic_tpu.config import MopoeConfig


def make_cfg(preset: str, workdir: str) -> MopoeConfig:
    common = dict(
        method="joint_elbo",
        dataset="testing_structured",
        text_encoding="word",
        vocab_size=10,
        initial_learning_rate=1e-4,
        seed=0,
        eval_lr=True, use_clf=True, calc_nll=True, calc_prd=True,
        eval_max_batches=0,       # FULL test set (run_epochs.py:148-228 parity)
        clf_quick_epochs=0,       # convergence-trained coherence classifiers
        dir_experiment=f"{workdir}/runs",
        dir_clf=f"{workdir}/clf",
    )
    if preset == "mini":
        return MopoeConfig(
            img_size=64, DIM_img=4, DIM_text=4, class_dim=8, batch_size=16,
            synthetic_length=64, end_epoch=4, eval_freq=4, eval_freq_fid=1,
            num_imp_samples=2, compute_dtype="float32",
            clf_quick_epochs=2, **{k: v for k, v in common.items()
                                   if k not in ("clf_quick_epochs",)},
        )
    # full: flagship dims (reference configs/leomed_mimic_config.json:
    # joint_elbo, 128px, DIM_img 64, class_dim 64, word encoding)
    return MopoeConfig(
        img_size=128, DIM_img=64, DIM_text=64, class_dim=64, batch_size=256,
        synthetic_length=8192, end_epoch=100, eval_freq=20, eval_freq_fid=20,
        donate_state=True,
        # the structured task converges by ~epoch 15; disable early stop so
        # the full ≥50-epoch trajectory (and every eval round) is recorded
        max_early_stopping_index=1000,
        # early epochs improve every time; a full-state checkpoint is
        # ~minutes over the tunnel — keep the periodic + final saves only
        checkpoint_on_improvement=False, checkpoint_freq=50,
        **common,
    )


def fmt_results(exp, final_eval, run_summary, elapsed_min: float) -> str:
    cfg = exp.cfg
    lines = [
        "# RESULTS — round-2 full-metrics training run",
        "",
        f"Flagship MoPoE (`{cfg.method}`), {cfg.img_size}px, word text, "
        f"batch {cfg.batch_size}, {run_summary.get('epochs_run', '?')} epochs "
        f"trained (cap {cfg.end_epoch}) on the structured "
        f"synthetic dataset ({cfg.synthetic_length} train / "
        f"{len(exp.dataset_test)} test samples, {cfg.synthetic_classes} latent "
        "classes). ALL heavy evals enabled at FULL test-set coverage; "
        "coherence classifiers trained to early-stop convergence "
        "(clf_quick_epochs=0). Metric set is isomorphic to the reference's "
        "(representation.py:137-145, coherence.py:204-311, "
        "likelihood.py:94-129).",
        "",
        f"Wall clock: {elapsed_min:.1f} min on "
        f"{jax.devices()[0].platform}:{jax.devices()[0].device_kind}. "
        f"Final train loss {float(run_summary['train']['total_loss']):.2f}, "
        f"test loss {float(run_summary['test']['total_loss']):.2f}.",
        "",
    ]

    lr_eval = final_eval.get("lr_eval", {})
    if lr_eval:
        lines += ["## Latent-representation eval (LR on subset posterior means)", ""]
        metrics = sorted({m for d in lr_eval.values() for m in d})
        lines.append("| subset | " + " | ".join(metrics) + " |")
        lines.append("|---|" + "---|" * len(metrics))
        for s_key in sorted(lr_eval):
            row = [f"{float(lr_eval[s_key].get(m, float('nan'))):.4f}" for m in metrics]
            lines.append(f"| {s_key} | " + " | ".join(row) + " |")
        lines.append("")

    gen = final_eval.get("gen_eval", {})
    if gen:
        rand = gen.get("random_coherence", {})
        if rand:
            lines += ["## Random-generation coherence (all modalities agree)", ""]
            for k, v in sorted(rand.items()):
                lines.append(f"- {k}: {v:.4f}")
            lines.append("")
        cond = gen.get("cond_coherence", {})
        if cond:
            lines += ["## Conditional-generation coherence AP per (label, subset, modality)", ""]
            mods = list(cfg.modality_names)
            lines.append("| label | subset | " + " | ".join(mods) + " |")
            lines.append("|---|---|" + "---|" * len(mods))
            for label in sorted(cond):
                for s_key in sorted(cond[label]):
                    row = [f"{float(cond[label][s_key].get(m, float('nan'))):.4f}" for m in mods]
                    lines.append(f"| {label} | {s_key} | " + " | ".join(row) + " |")
            lines.append("")
        bleu = {k: v for k, v in gen.items() if "bleu" in k.lower() or "word" in k.lower()}
        if bleu:
            lines += ["## Generated-text quality (BLEU)", ""]
            for k, v in sorted(bleu.items()):
                lines.append(f"- {k}: {v:.4f}")
            lines.append("")

    lh = final_eval.get("likelihoods", {})
    if lh:
        lines += ["## IWAE log-likelihoods per subset "
                  f"({cfg.num_imp_samples} importance samples)", ""]
        cols = list(cfg.modality_names) + ["joint"]
        lines.append("| subset | " + " | ".join(cols) + " |")
        lines.append("|---|" + "---|" * len(cols))
        for s_key in sorted(lh):
            row = [f"{float(lh[s_key].get(m, float('nan'))):.1f}" for m in cols]
            lines.append(f"| {s_key} | " + " | ".join(row) + " |")
        lines.append("")

    prd = final_eval.get("prd", {})
    if prd:
        lines += ["## Sample quality: FID + mean-PRD-precision per "
                  "(modality, conditioning subset)", ""]
        for k, v in sorted(prd.items()):
            try:
                lines.append(f"- {k}: {float(v):.4f}")
            except (TypeError, ValueError):
                pass
        lines.append("")

    lines += [
        "## Provenance",
        "",
        f"- run dir: `{exp.paths['experiment_run']}`",
        f"- experiments_dataframe row: `{cfg.dir_experiment}/experiments_dataframe.csv` "
        f"(str_experiment = `{exp.name}`)",
        f"- config: `{json.dumps({k: v for k, v in cfg.to_dict().items() if k in ('method', 'img_size', 'DIM_img', 'DIM_text', 'class_dim', 'batch_size', 'end_epoch', 'eval_freq', 'initial_learning_rate', 'synthetic_length')})}`",
        "",
    ]
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=("mini", "full"), default="mini")
    ap.add_argument("--workdir", default="/tmp/mopoe_r2_run")
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu) — the env var is "
                    "overridden by the axon sitecustomize")
    ap.add_argument("--device-store", action="store_true",
                    help="train from the HBM-resident dataset "
                    "(cfg.device_resident_data) instead of streaming")
    ap.add_argument("--epochs", type=int, default=0,
                    help="override end_epoch (0 = preset default)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mopoe_mimic_tpu.evaluation.runner import run_eval_suite
    from mopoe_mimic_tpu.experiment import Experiment
    from mopoe_mimic_tpu.train.loop import run_epochs

    cfg = make_cfg(args.preset, args.workdir)
    if args.device_store:
        cfg = cfg.replace(device_resident_data=True)
    if args.epochs:
        cfg = cfg.replace(end_epoch=args.epochs)
    exp = Experiment(cfg)
    t0 = time.time()
    print(f"[long_run_r2] preset={args.preset} run={exp.name}", flush=True)
    summary = run_epochs(exp, resume=False)

    # final full eval (classifiers now cached; captures the metric dict
    # directly rather than re-parsing the flattened CSV row)
    final_eval = {}
    state = summary["state"]
    cfg_eval = cfg
    if cfg_eval.eval_lr or cfg_eval.use_clf or cfg_eval.calc_nll or cfg_eval.calc_prd:
        from mopoe_mimic_tpu.evaluation.representation import (
            test_clf_lr_all_subsets, train_clf_lr_all_subsets,
        )
        from mopoe_mimic_tpu.evaluation.clf_loader import load_or_train_classifiers
        from mopoe_mimic_tpu.evaluation.coherence import test_generation
        from mopoe_mimic_tpu.evaluation.likelihood import estimate_likelihoods

        clf_lr = train_clf_lr_all_subsets(exp, state)
        final_eval["lr_eval"] = test_clf_lr_all_subsets(exp, state, clf_lr)
        evaluator = load_or_train_classifiers(exp)
        final_eval["gen_eval"] = test_generation(
            exp, state, evaluator, max_batches=cfg.eval_max_batches
        )
        final_eval["likelihoods"] = estimate_likelihoods(
            exp, state, max_batches=cfg.eval_max_batches
        )
        try:
            from mopoe_mimic_tpu.evaluation.embedding import make_default_embedder
            from mopoe_mimic_tpu.evaluation.sample_quality import calc_prd_score

            final_eval["prd"] = calc_prd_score(
                exp, state, make_default_embedder(exp),
                max_batches=cfg.eval_max_batches,
            )
        except (ImportError, FileNotFoundError) as e:
            print(f"[long_run_r2] PRD skipped: {e}", flush=True)

    elapsed_min = (time.time() - t0) / 60.0
    out = args.out or ("RESULTS_r2.md" if args.preset == "full" else
                       f"{args.workdir}/RESULTS_mini.md")
    md = fmt_results(exp, final_eval, summary, elapsed_min)
    with open(out, "w") as f:
        f.write(md)
    print(f"[long_run_r2] wrote {out} after {elapsed_min:.1f} min", flush=True)


if __name__ == "__main__":
    main()
