"""Stochastic-regime convergence race: executed torch reference vs this
framework (VERDICT r4 #1 — the remaining half of the north star).

Unlike the golden trajectory test (tests/test_golden_mmvae_core.py:588,
deterministic regime: dropout off, z=mu, matched batches), this trains
BOTH implementations in the reference's REAL training mode
(mimic/run_epochs.py:99-146): dropout 0.5 active in every res-block,
sampled reparameterization, shuffled epochs — each side with its own RNG
stream — and compares where they CONVERGE statistically:

  * per-epoch test loss (eval mode, sampled z, averaged over the full
    test set — run_epochs.test():148-175 semantics on both sides), and
  * final latent-representation quality: one SHARED sklearn
    LogisticRegression evaluator (reference representation.py:20-145
    semantics) fit on each side's subset-posterior means, mean AP over
    subsets × labels.

Both sides consume byte-identical data: the structured-noise synthetic
store exactly as Experiment.set_datasets builds it (train seed 0, test
seed 1), small enough for torch CPU to reach its plateau.

Usage (one process per run; serialize on the 1-core box):
  python benchmarks/convergence_race.py --side torch --seed 0 --epochs 40
  python benchmarks/convergence_race.py --side jax   --seed 0 --epochs 40
  python benchmarks/convergence_race.py --report     # aggregate table
Artifacts: /tmp/race/race_{side}_s{seed}.json; --report writes
RESULTS_r5 table rows to stdout + docs/CONVERGENCE_RACE.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT_DIR = os.environ.get("RACE_OUT", "/tmp/race")

# ---- the shared race configuration (both sides, byte-identical data) ----
RACE = dict(
    method="joint_elbo", img_size=64, dim=8, class_dim=16,
    vocab_size=50, len_sequence=128, batch_size=32, lr=1e-3,
    n_train=2048, n_classes=3, noise=0.25,
)


def make_cfg(seed: int, epochs: int):
    from mopoe_mimic_tpu.config import MopoeConfig

    return MopoeConfig(
        method=RACE["method"], dataset="testing_structured",
        synthetic_classes=RACE["n_classes"], synthetic_noise=RACE["noise"],
        synthetic_length=RACE["n_train"], batch_size=RACE["batch_size"],
        class_dim=RACE["class_dim"], DIM_img=RACE["dim"],
        DIM_text=RACE["dim"], img_size=RACE["img_size"],
        text_encoding="word", vocab_size=RACE["vocab_size"],
        compute_dtype="float32", eval_freq=10 ** 6, seed=seed,
        initial_learning_rate=RACE["lr"], end_epoch=epochs,
        use_clf=False, calc_nll=False, calc_prd=False, eval_lr=False,
        # apples-to-apples schedule: the torch side is a bare fixed-lr
        # Adam loop for the full epoch budget, so early stop and
        # lr-plateau must not fire on this side either
        max_early_stopping_index=10 ** 6, reduce_lr_on_plateau=False,
        dir_experiment="/tmp/race_runs",
    )


def make_datasets(cfg):
    """EXACTLY Experiment.set_datasets' testing_structured arrays
    (experiment.py:82-92): train seed 0, test seed 1 — identical bytes on
    both sides of the race."""
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic

    n = RACE["n_train"]
    train = SyntheticMimic(cfg, seed=0, length=n, structured=True,
                           n_classes=RACE["n_classes"], noise=RACE["noise"])
    test = SyntheticMimic(cfg, seed=1, length=max(n // 4, cfg.batch_size),
                          structured=True, n_classes=RACE["n_classes"],
                          noise=RACE["noise"])
    return train, test


# ---------------------------------------------------------------------------
# shared evaluator: sklearn LR on subset-posterior means (one program for
# both sides — differences in its output reflect TRAINING, not eval code)
# ---------------------------------------------------------------------------

def lr_eval_ap(train_mus, train_labels, test_mus, test_labels):
    """Mean average-precision over subsets × labels, sklearn
    LogisticRegression(lbfgs, max_iter=1000) per problem — the reference's
    evaluator (representation.py:169-187, metrics mean_AP)."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import average_precision_score

    per_subset = {}
    n_labels = train_labels.shape[1]
    for s_key in sorted(train_mus):
        aps = []
        for li in range(n_labels):
            y_tr = train_labels[:, li]
            if len(np.unique(y_tr)) < 2:
                continue
            clf = LogisticRegression(solver="lbfgs", max_iter=1000)
            clf.fit(train_mus[s_key], y_tr)
            p = clf.predict_proba(test_mus[s_key])[:, 1]
            aps.append(float(average_precision_score(test_labels[:, li], p)))
        per_subset[s_key] = float(np.mean(aps))
    return per_subset, float(np.mean(list(per_subset.values())))


def _batches(n, bs):
    for i in range(0, n - bs + 1, bs):
        yield np.arange(i, i + bs)


# ---------------------------------------------------------------------------
# torch side
# ---------------------------------------------------------------------------

def run_torch(seed: int, epochs: int, out_path: str):
    import torch

    import ref_harness as H

    cfg = make_cfg(seed, epochs)
    train_ds, test_ds = make_datasets(cfg)
    ref = H.load_reference()
    flags = H.make_flags(RACE["method"], dim=RACE["dim"],
                         class_dim=RACE["class_dim"],
                         img_size=RACE["img_size"],
                         vocab_size=RACE["vocab_size"],
                         len_sequence=RACE["len_sequence"],
                         batch_size=RACE["batch_size"], lr=RACE["lr"])
    model, mods, exp = H.build_model(ref, flags, seed=seed)
    opt = torch.optim.Adam(model.parameters(), lr=RACE["lr"],
                           betas=(0.9, 0.999), eps=1e-8)
    torch.manual_seed(seed + 1)  # dropout/reparam stream

    def to_torch(cols, idx):
        return {
            "PA": torch.from_numpy(
                cols["PA"][idx].transpose(0, 3, 1, 2).copy()),
            "Lateral": torch.from_numpy(
                cols["Lateral"][idx].transpose(0, 3, 1, 2).copy()),
            "text": torch.from_numpy(cols["text"][idx].astype(np.int64)),
        }

    bs = RACE["batch_size"]
    n = len(train_ds)
    shuffle_rng = np.random.default_rng(seed)
    history = []
    t_start = time.time()
    for epoch in range(epochs):
        model.train()
        perm = shuffle_rng.permutation(n)
        tr_losses = []
        for bi in _batches(n, bs):
            batch = to_torch(train_ds.arrays, perm[bi])
            opt.zero_grad()
            loss = H.total_loss_fn(ref, exp, model, batch)
            loss.backward()
            opt.step()
            tr_losses.append(float(loss.detach()))
        model.eval()
        te_losses = []
        with torch.no_grad():
            for bi in _batches(len(test_ds), bs):
                batch = to_torch(test_ds.arrays, bi)
                te_losses.append(float(H.total_loss_fn(ref, exp, model, batch)))
        history.append({"epoch": epoch,
                        "train_loss": float(np.mean(tr_losses)),
                        "test_loss": float(np.mean(te_losses))})
        print(f"[torch s{seed}] epoch {epoch}: train "
              f"{history[-1]['train_loss']:.2f} test "
              f"{history[-1]['test_loss']:.2f} "
              f"({time.time() - t_start:.0f}s)", flush=True)

    # subset-posterior means for the shared LR evaluator
    def subset_mus(ds):
        out = None
        model.eval()
        with torch.no_grad():
            for bi in _batches(len(ds), bs):
                latents = model.inference(to_torch(ds.arrays, bi))
                subs = latents["subsets"]
                if out is None:
                    out = {k: [] for k in subs if k}
                for k in out:
                    out[k].append(subs[k][0].numpy())
        return {k: np.concatenate(v) for k, v in out.items()}

    n_used_tr = (len(train_ds) // bs) * bs
    n_used_te = (len(test_ds) // bs) * bs
    per_subset, mean_ap = lr_eval_ap(
        subset_mus(train_ds), train_ds.labels[:n_used_tr],
        subset_mus(test_ds), test_ds.labels[:n_used_te])

    result = {"side": "torch", "seed": seed, "epochs": epochs,
              "history": history, "ap_per_subset": per_subset,
              "mean_ap": mean_ap, "wall_sec": time.time() - t_start,
              "race": RACE}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    # trained weights: the shared checkpoint for benchmarks/eval_parity.py
    torch.save(model.state_dict(), out_path.replace(".json", ".pt"))
    print(json.dumps({k: result[k] for k in
                      ("side", "seed", "mean_ap", "wall_sec")}))


# ---------------------------------------------------------------------------
# jax side — the framework's own production path (Experiment + run_epochs)
# ---------------------------------------------------------------------------

def run_jax(seed: int, epochs: int, out_path: str, torch_init: bool = False):
    import jax
    import jax.numpy as jnp

    from mopoe_mimic_tpu.experiment import Experiment
    from mopoe_mimic_tpu.train.loop import run_epochs

    cfg = make_cfg(seed, epochs)
    if torch_init:
        cfg = cfg.replace(torch_init=True)
    exp = Experiment(cfg)
    t_start = time.time()
    result = run_epochs(exp)
    state = result["state"]
    history = result["history"]

    train_ds, test_ds = exp.dataset_train, exp.dataset_test
    bs = cfg.batch_size
    model = exp.model

    @jax.jit
    def infer(params, bstats, batch):
        outs = model.apply(
            {"params": params, "batch_stats": bstats}, batch, train=False,
            rngs={"dropout": jax.random.PRNGKey(0),
                  "reparam": jax.random.PRNGKey(0)},
        )
        return {k: mu for k, (mu, _) in outs["latents"]["subsets"].items() if k}

    def subset_mus(ds):
        out = None
        for bi in _batches(len(ds), bs):
            batch = {k: jnp.asarray(v[bi]) for k, v in ds.arrays.items()}
            subs = jax.device_get(
                infer(state.params, state.batch_stats, batch))
            if out is None:
                out = {k: [] for k in subs}
            for k in out:
                out[k].append(np.asarray(subs[k]))
        return {k: np.concatenate(v) for k, v in out.items()}

    n_used_tr = (len(train_ds) // bs) * bs
    n_used_te = (len(test_ds) // bs) * bs
    per_subset, mean_ap = lr_eval_ap(
        subset_mus(train_ds), train_ds.labels[:n_used_tr],
        subset_mus(test_ds), test_ds.labels[:n_used_te])

    out = {"side": "jax", "seed": seed, "epochs": epochs,
           "history": history, "ap_per_subset": per_subset,
           "mean_ap": mean_ap, "wall_sec": time.time() - t_start,
           "race": RACE}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("side", "seed", "mean_ap", "wall_sec")}))


# ---------------------------------------------------------------------------
# report
# ---------------------------------------------------------------------------

def report():
    import glob

    runs = []
    for p in sorted(glob.glob(os.path.join(OUT_DIR, "race_*_s*.json"))):
        with open(p) as f:
            runs.append(json.load(f))
    if not runs:
        print("no race artifacts in", OUT_DIR)
        return

    def band(vals):
        return (float(np.mean(vals)), float(np.min(vals)), float(np.max(vals)))

    summary = {}
    for side in ("torch", "jax"):
        sruns = [r for r in runs if r["side"] == side]
        if not sruns:
            continue
        # plateau = mean test loss over the final 5 epochs of each run
        finals = [float(np.mean([h["test_loss"] for h in r["history"][-5:]]))
                  for r in sruns]
        aps = [r["mean_ap"] for r in sruns]
        summary[side] = {
            "seeds": [r["seed"] for r in sruns],
            "final_test_loss": band(finals),
            "final_test_loss_per_seed": finals,
            "mean_ap": band(aps),
            "mean_ap_per_seed": aps,
            "wall_sec_per_seed": [round(r["wall_sec"]) for r in sruns],
        }
    # overlap verdict: do the [min,max] bands intersect?
    verdict = {}
    if "torch" in summary and "jax" in summary:
        for metric in ("final_test_loss", "mean_ap"):
            t, j = summary["torch"][metric], summary["jax"][metric]
            overlap = not (t[2] < j[1] or j[2] < t[1])
            gap_pct = 100.0 * abs(t[0] - j[0]) / max(1e-9, abs(t[0]))
            verdict[metric] = {"bands_overlap": overlap,
                               "mean_gap_pct": round(gap_pct, 2)}
    out = {"race": runs[0]["race"], "summary": summary, "verdict": verdict}
    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)
    with open(os.path.join(REPO, "docs", "CONVERGENCE_RACE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["torch", "jax"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny fixture, 1 epoch — API shakeout only")
    ap.add_argument("--torch-init", action="store_true",
                    help="jax side trains from torch's default init "
                    "distribution (cfg.torch_init, models/torch_init.py) "
                    "— the init-family A/B for the plateau offset")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"],
                    help="jax side platform. Default cpu: the race regime "
                    "is f32 end-to-end (matching torch CPU numerics) and "
                    "the axon TPU tunnel's per-dispatch latency makes the "
                    "tiny race model slower there anyway. NOTE: a shell "
                    "`JAX_PLATFORMS=cpu` is overridden by the axon "
                    "sitecustomize — it must be set in-process, here, "
                    "before the first jax import.")
    args = ap.parse_args()
    if args.side == "jax" and args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mopoe_jax_cache")
    if args.smoke:
        RACE["n_train"] = 128
        args.epochs = 1
    if args.report:
        report()
        return
    os.makedirs(OUT_DIR, exist_ok=True)
    out_path = os.path.join(OUT_DIR, f"race_{args.side}_s{args.seed}.json")
    if args.side == "torch":
        run_torch(args.seed, args.epochs, out_path)
    else:
        run_jax(args.seed, args.epochs, out_path, torch_init=args.torch_init)


if __name__ == "__main__":
    main()
