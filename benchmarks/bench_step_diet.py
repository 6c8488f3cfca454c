"""Step byte-diet ablation: measure HBM bytes + honest-clock step time
across activation-precision / rematerialization variants.

The flagship train step is memory-bandwidth-bound at the v5e HBM roofline
(BENCH.md round-3: 33.9 GB accessed / 41.0 ms per batch-256 step =
828 GB/s), so the only step-speed lever left is BYTES, not FLOPs. The two
candidate diets:

  * ``bn_compute_dtype=compute``: run the BatchNorm normalize/affine math
    in the compute dtype (bf16) instead of float32. Batch statistics and
    running stats stay float32 (flax promotes stat computation
    internally); what changes is the dtype of every BN *output* and of
    the BN/ReLU activations XLA saves for the backward pass — the bulk of
    the step's traffic in a conv VAE.
  * ``remat=blocks``: ``jax.checkpoint`` each residual block, saving only
    block inputs and recomputing interiors in the backward pass. On a
    bandwidth-bound step this trades saved-activation READS for recompute
    WRITES, so it can go either way — hence measured, not assumed.
  * ``remat=conv``: policy remat — save only conv outputs
    (``checkpoint_name 'conv_out'``), recompute the elementwise
    BN/ReLU/dropout interiors. Convs are never recomputed; only the
    cheap elementwise chains are.

Usage: python benchmarks/bench_step_diet.py [--steps N] [--batch B]
Prints one JSON object per variant (bytes, FLOPs, honest ms/step,
samples/sec, and loss after the timed window as a sanity check).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mopoe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

VARIANTS = {
    "baseline": {},
    "bn_bf16": {"bn_compute_dtype": "compute"},
    "remat": {"remat": "blocks"},
    "bn_bf16+remat": {"bn_compute_dtype": "compute", "remat": "blocks"},
    "remat_conv": {"remat": "conv"},
    "bn_bf16+remat_conv": {"bn_compute_dtype": "compute", "remat": "conv"},
    # fused vocab head (ops/pallas_texthead.py): [B,L,V] logits stay in
    # VMEM, backward recomputes them on the MXU
    "texthead": {"fused_text_head": True},
    "bn_bf16+texthead": {"bn_compute_dtype": "compute", "fused_text_head": True},
    # fused BN→ReLU→1×1-conv heads (ops/pallas_pointwise.py): the blocks'
    # opening pointwise conv becomes a Pallas matmul with the BN/ReLU
    # prologue in VMEM; the custom VJP recomputes instead of saving
    "pointwise": {"fused_pointwise": True},
    "bn_bf16+texthead+pointwise": {
        "bn_compute_dtype": "compute", "fused_text_head": True,
        "fused_pointwise": True,
    },
}


def run_variant(name, overrides, args):
    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from mopoe_mimic_tpu.train.state import create_train_state
    from mopoe_mimic_tpu.train.step import make_train_step

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", text_encoding="word",
        img_size=128, DIM_img=64, DIM_text=64, class_dim=64, vocab_size=3517,
        batch_size=args.batch, donate_state=on_tpu, use_pallas_fusion=on_tpu,
        # training on ONE repeated noise batch is the worst case of the
        # documented 1x1-spatial BN divergence (docs/STABILITY.md): at the
        # canonical lr 5e-4 the loss sanity check NaNs within warmup, and
        # clipping does NOT prevent it (Adam first steps are sign-steps).
        # lr 1e-4 is the documented robust setting; bytes/ms are lr-blind.
        initial_learning_rate=1e-4,
        **overrides,
    )
    mesh = make_mesh(cfg)
    ds = SyntheticMimic(cfg, seed=0, length=cfg.batch_size)
    host_batch, _ = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))
    batch = shard_batch(mesh, host_batch)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state = replicate_state(mesh, state)
    step = make_train_step(cfg)

    compiled = jax.jit(lambda s, b: step(s, b)).lower(state, batch).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    bytes_acc = float(cost.get("bytes accessed", 0.0)) if cost else 0.0

    # warmup absorbs the server-side first-execution autotune (BENCH.md);
    # the value fetch is the only honest barrier through this tunnel.
    for _ in range(args.warmup):
        state, m = step(state, batch)
    loss0 = float(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, batch)
    loss = float(m["total_loss"])  # value fetch = honest clock
    dt = (time.perf_counter() - t0) / args.steps

    return {
        "variant": name,
        "step_bytes_GB": round(bytes_acc / 1e9, 2),
        "step_flops_T": round(flops / 1e12, 3),
        "ms_per_step": round(dt * 1e3, 2),
        "samples_per_sec": round(cfg.batch_size / dt, 0),
        "achieved_GBps": round(bytes_acc / dt / 1e9, 0),
        "loss_after": round(loss, 2),
        "loss_warm": round(loss0, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--variants", default=None,
                    help="comma list; default all")
    args = ap.parse_args()
    names = args.variants.split(",") if args.variants else list(VARIANTS)
    for name in names:
        rep = run_variant(name, VARIANTS[name], args)
        print(json.dumps(rep))


if __name__ == "__main__":
    main()
