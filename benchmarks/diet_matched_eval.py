"""Matched-numerics evaluation of the production diet vs the parity
config (VERDICT r4 #3 / weak #2).

The round-4 "diet convergence" table compared each run's losses computed
under its OWN numerics (bf16 BN + fused f32 head vs f32 BN), which is
apples-to-oranges. Here BOTH checkpoints — one trained with the diet,
one with the parity config, same seed/data/order (examples/rehearsal_r3
--no-evals runs) — are evaluated under ONE program: the parity-numerics
eval step on identical test batches with the same eval RNG, plus the
lr-eval AP pipeline and (shared-classifier) coherence. If the deltas are
within tolerance, the diet's +~12% throughput is a free lunch and
bench.py can ship it as the graded default.

Usage:
  python benchmarks/diet_matched_eval.py \
      --run-parity /tmp/mopoe_r5_parity/runs/<run>/checkpoints \
      --run-diet   /tmp/mopoe_r5_diet/runs/<run>/checkpoints \
      [--store /tmp/mimic_store]
Run dirs are auto-discovered when --run-* point at the rehearsal
workdirs. Writes docs/DIET_MATCHED_EVAL.json and prints the table.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _find_ckpt_dir(path: str) -> str:
    """Accept a workdir, run dir, or checkpoints dir."""
    if os.path.basename(path.rstrip("/")) == "checkpoints":
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "checkpoints"),
                            recursive=True), key=os.path.getmtime)
    if not hits:
        raise SystemExit(f"no checkpoints dir under {path}")
    return hits[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-parity", default="/tmp/mopoe_r5_parity")
    ap.add_argument("--run-diet", default="/tmp/mopoe_r5_diet")
    ap.add_argument("--store", default="/tmp/mimic_store")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--with-coherence", action="store_true",
                    help="also run shared-classifier coherence + lr-eval "
                    "(slower; test-ELBO-only without it)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mopoe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.experiment import Experiment
    from mopoe_mimic_tpu.train.step import make_eval_step
    from mopoe_mimic_tpu.utils.checkpoints import CheckpointManager

    on_tpu = jax.devices()[0].platform != "cpu"
    # ONE eval program: parity numerics (f32 BN, unfused head) regardless
    # of which config trained the weights — the param trees are identical
    cfg = MopoeConfig(
        method="joint_elbo", dataset="Mimic", text_encoding="word",
        img_size=128, DIM_img=64, DIM_text=64, class_dim=64,
        batch_size=args.batch, dir_data=args.store,
        dir_experiment="/tmp/mopoe_r5_matched_eval",
        device_resident_data=True, donate_state=False,
        use_pallas_fusion=on_tpu,
        eval_lr=args.with_coherence, use_clf=args.with_coherence,
        calc_nll=False, calc_prd=False, clf_quick_epochs=6,
    )
    exp = Experiment(cfg)
    eval_step = make_eval_step(cfg, exp.model)

    def matched_eval(ckpt_dir: str):
        state = exp.init_state(jax.random.PRNGKey(0))
        mgr = CheckpointManager(ckpt_dir, async_save=False)
        epoch, state = mgr.restore(state)
        mgr.close()
        # identical test batches + identical eval rng for both checkpoints
        rng = jax.random.PRNGKey(1234)
        losses = []
        store_train, store_test = exp.stores()
        for batch, _ in store_test.iter_epoch(0, cfg.batch_size, seed=7):
            rng, r = jax.random.split(rng)
            m = eval_step(state, batch, r)
            losses.append(m)
        import jax.numpy as jnp

        test_loss = float(np.mean([float(m["total_loss"]) for m in losses]))
        jd = float(np.mean([float(m["joint_divergence"]) for m in losses]))
        out = {"ckpt_epoch": int(epoch), "test_loss_parity_numerics": test_loss,
               "joint_divergence": jd}
        if args.with_coherence:
            from mopoe_mimic_tpu.evaluation.runner import run_eval_suite

            # run_eval_suite returns a FLAT {metric: float} dict
            # (flatten_metrics, sep="_"): aggregate by key pattern
            ev = run_eval_suite(exp, state, epoch=int(epoch))
            aps = [v for k, v in ev.items()
                   if k.startswith("lr_eval_") and "_mean_AP_total" in k
                   and isinstance(v, (int, float))]
            if aps:
                out["lr_eval_mean_ap"] = float(np.mean(aps))
            rc = [v for k, v in ev.items()
                  if k.startswith("gen_eval_random_coherence")
                  and isinstance(v, (int, float))]
            if rc:
                out["random_coherence"] = float(np.mean(rc))
        return out

    results = {
        "parity": matched_eval(_find_ckpt_dir(args.run_parity)),
        "diet": matched_eval(_find_ckpt_dir(args.run_diet)),
    }
    p, d = results["parity"], results["diet"]
    results["delta"] = {
        k: d[k] - p[k] for k in p if k in d and isinstance(p[k], float)
    }
    rel = abs(results["delta"]["test_loss_parity_numerics"]) / max(
        1e-9, abs(p["test_loss_parity_numerics"]))
    results["delta"]["test_loss_rel"] = rel
    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)
    with open(os.path.join(REPO, "docs", "DIET_MATCHED_EVAL.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
