"""Serving-endpoint latency benchmark for serve.InferenceSession.

The reference has no deployment surface (its eval code re-instantiates
training classes); serve.py is this framework's production serving path —
jitted generate / encode / cond_generate endpoints with static batch-size
bucketing. This tool measures end-to-end endpoint latency (request in →
numpy out, i.e. including the device→host result transfer) per bucket
size, the number a capacity plan actually needs.

Protocol: per (endpoint, batch) the first call is discarded (compile +
first-execution autotune), then ``--calls`` timed calls; p50/p95 wall
latency and implied samples/sec are reported as one JSON line each.

Usage: python benchmarks/bench_serve.py [--batches 1,8,64] [--calls 20]
       [--run_dir DIR]   (default: a fresh random-init flagship session —
                          latency is weight-value-independent)
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
    ap.add_argument("--run_dir", default=None,
                    help="Experiment run dir (config.json + checkpoints); "
                    "default = random-init flagship weights")
    ap.add_argument("--batches", default="1,8,64")
    ap.add_argument("--calls", type=int, default=20)
    ap.add_argument("--endpoints", default="generate,encode,cond_generate")
    ap.add_argument("--compact", action="store_true",
                    help="production wire format: on-device text argmax "
                    "(int32 ids) + uint8 images — the download shrinks "
                    "~20x on the flagship generate endpoint")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.serve import InferenceSession
    from mopoe_mimic_tpu.train.state import create_train_state

    if args.run_dir:
        session = InferenceSession(run_dir=args.run_dir,
                                   buckets=tuple(sorted(set(batches))))
        cfg = session.cfg
    else:
        on_tpu = jax.devices()[0].platform != "cpu"
        cfg = MopoeConfig(
            method="joint_elbo", dataset="testing", img_size=128,
            DIM_img=64, DIM_text=64, class_dim=64, text_encoding="word",
            vocab_size=3517, batch_size=8,
            compute_dtype="bfloat16" if on_tpu else "float32",
        )
        ds = SyntheticMimic(cfg, seed=0, length=8)
        batch, _ = next(iter(BatchLoader(ds, 8, shuffle=False)))
        state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
        session = InferenceSession(cfg=cfg, state=state,
                                   buckets=tuple(sorted(set(batches))))

    # request payloads at the largest batch; sliced per measurement
    ds = SyntheticMimic(cfg.replace(batch_size=max(batches)), seed=1,
                        length=max(batches))
    full, _ = next(iter(BatchLoader(ds, max(batches), shuffle=False)))
    full = {k: np.asarray(v) for k, v in full.items()}

    def call(endpoint, n, seed):
        req = {k: v[:n] for k, v in full.items()}
        if endpoint == "generate":
            return session.generate(n, seed=seed, compact=args.compact)
        if endpoint == "encode":
            return session.encode(req)
        if endpoint == "cond_generate":
            return session.cond_generate(req, seed=seed, compact=args.compact)
        raise ValueError(endpoint)

    for endpoint in args.endpoints.split(","):
        for n in batches:
            call(endpoint, n, seed=0)  # compile + first-exec, untimed
            lat = []
            for i in range(args.calls):
                t0 = time.perf_counter()
                call(endpoint, n, seed=i + 1)
                lat.append(time.perf_counter() - t0)
            lat_ms = np.array(lat) * 1e3
            print(json.dumps({
                "endpoint": endpoint,
                "wire": "compact" if args.compact else "full",
                "batch": n,
                "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
                "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
                "samples_per_sec": round(
                    n / float(np.percentile(lat_ms, 50)) * 1e3, 1),
                "calls": args.calls,
            }))


if __name__ == "__main__":
    main()
