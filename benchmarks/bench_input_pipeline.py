"""Input-pipeline benchmark at (simulated) MIMIC scale.

The real MIMIC-CXR store is ~65k studies × 2 views; this driver builds an
on-disk .npy store of --rows studies (default 8192 ≈ 1.1 GB uint8 at
128px) plus findings/labels CSVs, then measures end-to-end training
throughput streaming FRESH batches from the memmap store every step:

  * float32 store, host float batches        (the naive path)
  * uint8 store, host dequant to float32     (4× less disk, same PCIe)
  * uint8 store, uint8 transfer + device dequant (4× less disk AND PCIe)
  * each with threaded vs unthreaded prefetch

against the resident-batch ceiling (same step, no input pipeline).
Prints one JSON line per mode. Usage:
    python benchmarks/bench_input_pipeline.py [--rows N] [--steps N] [--quick]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

FINDINGS = [
    "no focal consolidation pleural effusion or pneumothorax",
    "mild pulmonary edema with small bilateral effusions",
    "the lungs are clear without evidence of pneumonia",
    "support devices in standard position no acute findings",
]


def build_store(root: str, rows: int, img_size: int, uint8: bool) -> str:
    """Write a synthetic files_small_{img_size} store directly (no JPEG
    stage — this benchmarks the loader, not PIL)."""
    base = os.path.join(root, f"files_small_{img_size}")
    os.makedirs(base, exist_ok=True)
    rng = np.random.default_rng(0)
    for split, n in (("train", rows), ("eval", max(rows // 8, 4)), ("test", max(rows // 8, 4))):
        for view in ("pa", "lat"):
            if uint8:
                arr = rng.integers(0, 256, (n, img_size, img_size), dtype=np.uint8)
            else:
                arr = rng.random((n, img_size, img_size), dtype=np.float32)
            np.save(os.path.join(base, f"{split}_{view}.npy"), arr)
        pd.DataFrame({"findings": [FINDINGS[i % len(FINDINGS)] for i in range(n)]}).to_csv(
            os.path.join(base, f"{split}_findings.csv"), index=False)
        labels = pd.DataFrame(rng.integers(0, 2, (n, 3)),
                              columns=["Lung Opacity", "Pleural Effusion", "Support Devices"])
        labels["Finding"] = (labels == 1).any(axis=1).astype(int)
        labels.to_csv(os.path.join(base, f"{split}_labels.csv"), index=False)
    return base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--img-size", type=int, default=128)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.rows, args.steps, args.batch, args.img_size = 256, 8, 16, 64

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mopoe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.mimic_dataset import MimicDataset
    from mopoe_mimic_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from mopoe_mimic_tpu.parallel.prefetch import prefetch_to_device
    from mopoe_mimic_tpu.train.state import create_train_state
    from mopoe_mimic_tpu.train.step import make_train_step

    on_tpu = jax.devices()[0].platform != "cpu"
    tiny = args.quick
    base_kw = dict(
        dataset="Mimic", method="joint_elbo", img_size=args.img_size,
        DIM_img=4 if tiny else 64, DIM_text=4 if tiny else 64,
        class_dim=8 if tiny else 64, text_encoding="char",
        batch_size=args.batch, donate_state=on_tpu,
        compute_dtype="float32" if tiny else "bfloat16",
    )

    stores = {}
    tmp = tempfile.mkdtemp(prefix="mopoe_pipe_bench_")
    for kind in ("f32", "u8"):
        root = os.path.join(tmp, kind)
        os.makedirs(root, exist_ok=True)
        build_store(root, args.rows, args.img_size, uint8=(kind == "u8"))
        stores[kind] = root

    mesh = make_mesh(MopoeConfig(**base_kw, dir_data=stores["f32"]))

    def measure(mode: str, cfg, ds, threaded=None) -> float:
        loader = BatchLoader(ds, cfg.batch_size, shuffle=True, seed=0)
        host_batch, _ = next(iter(loader))
        batch0 = shard_batch(
            mesh,
            {k: v for k, v in host_batch.items()},
        )
        state = replicate_state(mesh, create_train_state(cfg, jax.random.PRNGKey(0), batch0))
        step = make_train_step(cfg)
        for _ in range(args.warmup):
            state, m = step(state, batch0)
        float(m["total_loss"])  # value fetch: the tunnel's block_until_ready returns pre-execution (BENCH.md round-3)

        t0 = time.perf_counter()
        done = 0
        if mode == "resident":
            for _ in range(args.steps):
                state, m = step(state, batch0)
        else:
            epoch = 0
            while done < args.steps:
                loader.set_epoch(epoch)
                epoch += 1
                for b, _ in prefetch_to_device(iter(loader), mesh,
                                               quantize=cfg.transfer_uint8,
                                               threaded=threaded):
                    state, m = step(state, b)
                    done += 1
                    if done >= args.steps:
                        break
        float(m["total_loss"])  # value fetch: the tunnel's block_until_ready returns pre-execution (BENCH.md round-3)
        dt = time.perf_counter() - t0
        sps = cfg.batch_size * args.steps / dt
        print(json.dumps({
            "metric": f"input_pipeline_{mode}", "value": round(sps, 1),
            "unit": "samples/sec", "rows": args.rows,
            "img_size": args.img_size, "batch": cfg.batch_size,
        }), flush=True)
        return sps

    cfg_f32 = MopoeConfig(**base_kw, dir_data=stores["f32"])
    ds_f32 = MimicDataset(cfg_f32, "train")
    cfg_u8h = MopoeConfig(**base_kw, dir_data=stores["u8"])
    ds_u8h = MimicDataset(cfg_u8h, "train")
    cfg_u8d = MopoeConfig(**base_kw, dir_data=stores["u8"], transfer_uint8=True)
    ds_u8d = MimicDataset(cfg_u8d, "train")

    ceiling = measure("resident", cfg_f32, ds_f32)
    results = {"resident_ceiling": ceiling}
    for name, cfg, ds in (("f32_stream", cfg_f32, ds_f32),
                          ("u8_hostdeq_stream", cfg_u8h, ds_u8h),
                          ("u8_devdeq_stream", cfg_u8d, ds_u8d)):
        for threaded in (False, True):
            key = f"{name}_{'threaded' if threaded else 'sync'}"
            results[key] = measure(key, cfg, ds, threaded=threaded)

    best = max(v for k, v in results.items() if k != "resident_ceiling")
    print(json.dumps({
        "metric": "input_pipeline_efficiency",
        "value": round(100.0 * best / ceiling, 1),
        "unit": "% of resident-batch ceiling",
        "best_mode": max((k for k in results if k != "resident_ceiling"),
                         key=results.get),
    }))


if __name__ == "__main__":
    main()
