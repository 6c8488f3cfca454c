"""Flagship-step profiling driver (VERDICT round-1 item 2: profile, then
chase the next bottleneck).

Measures, on the current backend:
  1. resident-batch step time (pure compute) — the bench.py number;
  2. streaming step time through the prefetch queue (input pipeline
     included), float32 vs uint8 transfer;
  3. XLA cost analysis of the compiled step (FLOPs / bytes per step) →
     achieved FLOP rate;
  4. optionally an xplane trace (--trace DIR) for TensorBoard's profiler.

Usage: python examples/profile_step.py [--trace /tmp/xplane] [--steps N]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--trace", default=None, help="xplane trace dir")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--small", action="store_true", help="tiny shapes smoke")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from mopoe_mimic_tpu.parallel.prefetch import prefetch_to_device
    from mopoe_mimic_tpu.train.state import create_train_state
    from mopoe_mimic_tpu.train.step import make_train_step
    from mopoe_mimic_tpu.utils import profiling

    on_tpu = jax.devices()[0].platform != "cpu"
    dims = dict(img_size=64, DIM_img=4, DIM_text=4, class_dim=8,
                vocab_size=100, compute_dtype="float32") if args.small else \
        dict(img_size=128, DIM_img=64, DIM_text=64, class_dim=64,
             vocab_size=3517)
    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", text_encoding="word",
        batch_size=args.batch, donate_state=on_tpu,
        use_pallas_fusion=on_tpu, **dims,
    )
    mesh = make_mesh(cfg)
    ds = SyntheticMimic(cfg, seed=0, length=cfg.batch_size * 8)
    loader = BatchLoader(ds, cfg.batch_size, shuffle=False)
    host_batch, _ = next(iter(loader))
    batch = shard_batch(mesh, host_batch)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state = replicate_state(mesh, state)
    step = make_train_step(cfg)

    # --- cost analysis of the compiled step --------------------------------
    compiled = jax.jit(lambda s, b: step(s, b)).lower(state, batch).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    bytes_acc = float(cost.get("bytes accessed", 0.0)) if cost else 0.0

    # --- resident-batch compute --------------------------------------------
    for _ in range(5):
        state, m = step(state, batch)
    float(m["total_loss"])  # value fetch: the tunnel's block_until_ready returns pre-execution (BENCH.md round-3)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, batch)
    float(m["total_loss"])  # value fetch: the tunnel's block_until_ready returns pre-execution (BENCH.md round-3)
    dt_resident = (time.perf_counter() - t0) / args.steps

    # --- streaming: float32 vs uint8 transfer ------------------------------
    def stream(quantize: bool) -> float:
        nonlocal state
        done = 0
        t0 = time.perf_counter()
        while done < args.steps:
            loader.set_epoch(done)
            for b, _ in prefetch_to_device(iter(loader), mesh, quantize=quantize):
                state, m = step(state, b)
                done += 1
                if done >= args.steps:
                    break
        float(m["total_loss"])  # value fetch: the tunnel's block_until_ready returns pre-execution (BENCH.md round-3)
        return (time.perf_counter() - t0) / args.steps

    # warm the uint8-shape executable before timing
    from mopoe_mimic_tpu.parallel.prefetch import quantize_batch_uint8

    state, m = step(state, shard_batch(mesh, quantize_batch_uint8(host_batch)))
    float(m["total_loss"])  # value fetch: the tunnel's block_until_ready returns pre-execution (BENCH.md round-3)
    dt_stream_f32 = stream(False)
    dt_stream_u8 = stream(True)

    if args.trace:
        with profiling.trace(args.trace):
            for _ in range(5):
                state, m = step(state, batch)
            float(m["total_loss"])  # value fetch: the tunnel's block_until_ready returns pre-execution (BENCH.md round-3)

    bs = cfg.batch_size
    report = {
        "device": f"{jax.devices()[0].platform}:{jax.devices()[0].device_kind}",
        "batch_size": bs,
        "step_flops_G": round(flops / 1e9, 1),
        "step_bytes_GB": round(bytes_acc / 1e9, 2),
        "resident_ms_per_step": round(dt_resident * 1e3, 2),
        "resident_samples_per_sec": round(bs / dt_resident, 0),
        "achieved_TFLOPs": round(flops / dt_resident / 1e12, 2),
        "stream_f32_ms_per_step": round(dt_stream_f32 * 1e3, 2),
        "stream_f32_samples_per_sec": round(bs / dt_stream_f32, 0),
        "stream_uint8_ms_per_step": round(dt_stream_u8 * 1e3, 2),
        "stream_uint8_samples_per_sec": round(bs / dt_stream_u8, 0),
        "input_pipeline_overhead_f32": round(dt_stream_f32 / dt_resident, 2),
        "input_pipeline_overhead_uint8": round(dt_stream_u8 / dt_resident, 2),
        "memory": profiling.device_memory_stats(),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
