"""Round-3 rehearsal, one command: raw MIMIC-layout tree → ingest →
device-resident flagship training with the full heavy-eval suite.

Reproduces RESULTS_r3.md end-to-end and prints a per-stage timing table.
The fabricated tree / ingested store are cached in --raw/--store and
reused on rerun (matching the reference's resize-cache semantics), so the
first invocation measures ingest throughput and reruns measure training
only.

Usage:
    python examples/rehearsal_r3.py                      # full 65k rehearsal
    python examples/rehearsal_r3.py --studies 600 --epochs 2 --platform cpu
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mopoe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", default="/tmp/mimic_raw")
    ap.add_argument("--store", default="/tmp/mimic_store")
    ap.add_argument("--workdir", default="/tmp/mopoe_r3_rehearsal")
    ap.add_argument("--studies", type=int, default=65000)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--eval_freq", type=int, default=5)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=5e-4,
                    help="5e-4 = the reference's canonical flagship lr; "
                    "tiny-batch smoke runs on the noise-like fabricated "
                    "images need 1e-4 (docs/STABILITY.md BN divergence)")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (the env var is overridden by "
                    "the axon sitecustomize)")
    ap.add_argument("--sync-plots", action="store_true",
                    help="disable async plot rendering (profiling mode)")
    ap.add_argument("--diet", action="store_true",
                    help="train with the production byte-diet "
                    "(bn_compute_dtype=compute + fused_text_head, the "
                    "bench.py default config) instead of the parity config")
    ap.add_argument("--img-size", type=int, default=128, choices=[64, 128, 256],
                    help="image resolution: 128 = flagship; 256 = the "
                    "reference's bigmem cell (test_training.py:103) — "
                    "triggers a separate resize/ingest pass at 256px")
    ap.add_argument("--text", default="word", choices=["word", "char"],
                    help="text encoding: char = the reference's default "
                    "char-1024 pipeline (flags.py:157)")
    ap.add_argument("--no-evals", action="store_true",
                    help="loss-only epochs, no heavy eval suite — for "
                    "checkpoint-producing runs whose metrics are computed "
                    "afterwards under one matched eval program "
                    "(benchmarks/diet_matched_eval.py)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    timings = {}

    # stage 0: fabricate the raw tree (input prep, not graded)
    if not os.path.exists(os.path.join(args.raw, "mimic-cxr-2.0.0-metadata.csv.gz")):
        t0 = time.time()
        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "make_mimic_scale_tree.py"),
             "--out", args.raw, "--studies", str(args.studies)],
            check=True)
        timings["fabricate_tree_s"] = round(time.time() - t0, 1)

    # stage 1: ingest (join + report parse + resize cache + memmap stores)
    from mopoe_mimic_tpu.data.mimic_ingest import MimicIngest
    if not os.path.exists(os.path.join(
            args.store, f"files_small_{args.img_size}", "train_pa.npy")):
        t0 = time.time()
        ingest = MimicIngest(args.raw, args.store, img_size=args.img_size)
        n = ingest()
        timings["ingest_s"] = round(time.time() - t0, 1)
        timings["ingest_stats"] = ingest.stats
        timings["ingest_rows"] = n

    # stage 2: flagship training with full evals from the HBM-resident store
    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.experiment import Experiment
    from mopoe_mimic_tpu.train.loop import run_epochs

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = MopoeConfig(
        method="joint_elbo", dataset="Mimic", text_encoding=args.text,
        img_size=args.img_size, DIM_img=64, DIM_text=64, class_dim=64,
        batch_size=args.batch, initial_learning_rate=args.lr,
        end_epoch=args.epochs, eval_freq=args.eval_freq,
        eval_freq_fid=args.eval_freq,
        eval_lr=not args.no_evals, use_clf=not args.no_evals,
        calc_nll=not args.no_evals, calc_prd=not args.no_evals,
        eval_max_batches=0, clf_quick_epochs=0,
        max_early_stopping_index=1000,
        device_resident_data=True,
        donate_state=on_tpu, use_pallas_fusion=on_tpu,
        async_plots=not args.sync_plots,
        dir_data=args.store,
        dir_experiment=f"{args.workdir}/runs",
        dir_clf=f"{args.workdir}/clf",
        **({"bn_compute_dtype": "compute", "fused_text_head": True}
           if args.diet else {}),
        # 256px at lr 5e-4 needs the measured warmup fix for the 1x1-BN
        # transient (docs/STABILITY.md, tests/test_warmup_stability.py)
        **({"lr_warmup_steps": 300} if args.img_size == 256 else {}),
    )
    t0 = time.time()
    exp = Experiment(cfg)
    timings["experiment_init_s"] = round(time.time() - t0, 1)  # incl. vocab build
    t0 = time.time()
    summary = run_epochs(exp, resume=False)
    timings["train_s"] = round(time.time() - t0, 1)
    timings["epochs_run"] = summary.get("epochs_run")
    timings["final_train_loss"] = float(summary["train"]["total_loss"])
    timings["final_test_loss"] = float(summary["test"]["total_loss"])
    exp.tb_logger.close()
    if exp.checkpoints is not None:
        exp.checkpoints.close()
    print(json.dumps(timings, default=str))


if __name__ == "__main__":
    main()
