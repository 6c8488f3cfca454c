"""Per-op byte breakdown of the flagship train step's optimized HLO.

The step is HBM-bandwidth-bound at the roofline (BENCH.md step-diet
table), so the remaining speed frontier is *which ops move the bytes*.
This tool compiles the flagship step, walks the optimized HLO entry
computation, and ranks instructions by an operand+output byte estimate —
the data needed to decide whether a Pallas fusion (or a different
residual policy) can remove traffic that XLA cannot.

Byte model: for each top-level instruction, bytes = Σ operand buffer
sizes + output buffer size (tuple elements summed; parameters and
constants included — this intentionally over-counts reuse inside a
fusion, matching the "bytes accessed" convention of XLA cost analysis).

Usage: python benchmarks/analyze_step_bytes.py [--batch 256] [--top 40]
       [--group]  (aggregate by op-category instead of per-op)
"""

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mopoe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "f8e4m3fn": 1, "f8e5m2": 1,
}

SHAPE_RE = re.compile(r"(f64|f32|f16|bf16|s64|u64|s32|u32|s16|u16|s8|u8|pred|f8e4m3fn|f8e5m2)\[([0-9,]*)\]")


def shape_bytes(text):
    """Sum buffer bytes over every array shape literal in `text`."""
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def parse_entry(hlo_text):
    """Yield (name, opcode, out_bytes, operand_bytes, line) for each
    instruction of the ENTRY computation."""
    lines = hlo_text.splitlines()
    in_entry = False
    for ln in lines:
        s = ln.strip()
        if s.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if s == "}":
                break
            m = re.match(r"(ROOT\s+)?([%\w.\-]+)\s*=\s*(\([^=]*?\)|\S+)\s+([\w\-]+)\(", s)
            if not m:
                continue
            name, out_shape, opcode = m.group(2), m.group(3), m.group(4)
            out_b = shape_bytes(out_shape)
            # operand shapes appear inside the call args; strip the output
            # shape prefix then scan the remainder of the line.
            rest = s[m.end():]
            # cut metadata/backend_config tails (shapes never appear there
            # except in called computation signatures, which we keep out
            # by cutting at ", calls=" / metadata).
            for cut in (", metadata=", ", backend_config=", ", calls="):
                i = rest.find(cut)
                if i >= 0:
                    rest = rest[:i]
            op_b = shape_bytes(rest)
            yield name, opcode, out_b, op_b, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true")
    ap.add_argument("--bn_bf16", action="store_true")
    ap.add_argument("--fused_text_head", action="store_true")
    ap.add_argument("--fused_pointwise", action="store_true")
    ap.add_argument("--dump", default=None, help="write full HLO text here")
    args = ap.parse_args()

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
        initial_learning_rate=1e-4,
        **({"bn_compute_dtype": "compute"} if args.bn_bf16 else {}),
        **({"fused_text_head": True} if args.fused_text_head else {}),
        **({"fused_pointwise": True} if args.fused_pointwise else {}),
    )
    mesh = make_mesh(cfg)
    ds = SyntheticMimic(cfg, seed=0, length=cfg.batch_size)
    host_batch, _ = next(iter(BatchLoader(ds, cfg.batch_size, shuffle=False)))
    batch = shard_batch(mesh, host_batch)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state = replicate_state(mesh, state)
    step = make_train_step(cfg)

    compiled = jax.jit(lambda s, b: step(s, b)).lower(state, batch).compile()
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)

    rows = []
    for name, opcode, out_b, op_b, line in parse_entry(hlo):
        rows.append({"name": name, "op": opcode, "bytes": out_b + op_b,
                     "out_bytes": out_b, "line": line[:220]})
    total = sum(r["bytes"] for r in rows)
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    print(json.dumps({
        "entry_instr": len(rows),
        "entry_bytes_GB": round(total / 1e9, 2),
        "cost_analysis_bytes_GB": round(float(cost.get("bytes accessed", 0)) / 1e9, 2) if cost else None,
    }))

    if args.group:
        groups = collections.Counter()
        for r in rows:
            groups[r["op"]] += r["bytes"]
        for op, b in groups.most_common(args.top):
            print(f"{b/1e9:9.3f} GB  {op}")
    else:
        rows.sort(key=lambda r: -r["bytes"])
        for r in rows[: args.top]:
            print(f"{r['bytes']/1e9:8.3f} GB (out {r['out_bytes']/1e9:6.3f})  {r['op']:18s} {r['line'][:170]}")


if __name__ == "__main__":
    main()
