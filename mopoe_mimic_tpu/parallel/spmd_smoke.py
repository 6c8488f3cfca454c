"""Multi-process SPMD launch validation — run one copy per host.

The reference validates its distributed path with an in-node mp.spawn DDP
test (mimic/tests/test_training.py:116-119); the TPU-native equivalent is
a *real multi-controller launch*: every process runs this same program,
`jax.distributed.initialize` federates the devices, and the identical
jitted train step executes over the global mesh with XLA inserting the
cross-process collectives.

What it exercises, end to end:

  * `init_multihost` (parallel/mesh.py) — coordinator rendezvous;
  * the global `Mesh` over all processes' devices;
  * per-process `BatchLoader` host shards of one global epoch order
    assembled into global arrays via `shard_batch`
    (`jax.make_array_from_process_local_data`);
  * the row-sharded multi-host `DeviceStore` (each process uploads only
    the rows its devices own) and its on-device gather;
  * the real jitted train step (gradient psum across processes) and the
    scanned-epoch program (train/scan.py);
  * cross-process metric agreement (`process_allgather`) — every
    controller must observe bit-identical losses.

Usage — on a real multi-host slice (args auto-detected on Cloud TPU):

    python -m mopoe_mimic_tpu.parallel.spmd_smoke

On any cluster / for CI (N processes on one machine, CPU backend):

    python -m mopoe_mimic_tpu.parallel.spmd_smoke \
        --coordinator localhost:9955 --num-processes 2 --process-id $i \
        --platform cpu --out /tmp/smoke_$i.json

Exit code 0 + an ``ok: true`` JSON artifact per process on success.
tests/test_multiprocess_spmd.py drives exactly this as a subprocess
fixture and checks the distributed losses against a single-process
control run.
"""

from __future__ import annotations

import argparse
import json
import sys


_BARRIER_SEQ = [0]


def _barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Line the processes up via the coordination service (NOT a device
    collective). Needed because the gloo CPU-collective rendezvous has a
    hard 30 s handshake window: on a contended host, one process can
    reach its first collective execution while the peer is still
    compiling, and the handshake times out. Pairing each phase with an
    AOT pre-compile (below) plus this barrier guarantees both sides have
    finished compiling before either starts executing collectives."""
    import jax

    if jax.process_count() <= 1:
        return
    _BARRIER_SEQ[0] += 1
    tag = f"spmd_smoke_{_BARRIER_SEQ[0]}_{name}"
    try:
        # coordination-service barrier: host-side, no device collective,
        # so it can line processes up BEFORE any collective executes.
        # Private API (no stability guarantee) — hence the fallback.
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            tag, timeout_in_ms=timeout_ms
        )
    except Exception:  # jax upgrade moved the private API (ADVICE r3)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _precompile(jitted, *args) -> None:
    """AOT-compile a jitted callable for these args; with the persistent
    compilation cache on (main()), the later dispatch-path compile of the
    same program is a disk hit, so this costs one compile, not two."""
    try:
        jitted.lower(*args).compile()
    except Exception:  # non-jitted callable or lowering quirk: best effort
        pass


def _tiny_cfg(n_global_devices: int):
    """Tiny-shape flagship (same shapes as __graft_entry__.dryrun_multichip)."""
    from mopoe_mimic_tpu.config import MopoeConfig

    return MopoeConfig(
        method="joint_elbo",
        dataset="testing",
        img_size=64,
        DIM_img=2,
        DIM_text=2,
        class_dim=4,
        text_encoding="word",
        vocab_size=50,
        batch_size=2 * n_global_devices,
        compute_dtype="float32",
        initial_learning_rate=5e-4,
    )


def run(steps: int = 2, emulate_shards: int = 0,
        ckpt_dir: str | None = None, heavy_evals: bool = False) -> dict:
    """The validation body; call after (optional) distributed init.

    ``emulate_shards`` (single-process only): build the streaming batch
    with the row ordering a K-process launch would assemble (per-shard
    strided slices concatenated in process order), so a 1-process control
    run is numerically comparable to a K-process run. MoE's deterministic
    batch partition (ops/fusion.mixture_component_selection) and the
    per-row reparam noise make the loss ordering-sensitive, so the
    control must reproduce the ordering, not just the row set.

    Returns the report dict (also the JSON artifact's contents).
    """
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    from mopoe_mimic_tpu.data.device_store import DeviceStore
    from mopoe_mimic_tpu.data.loader import BatchLoader
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.parallel.mesh import (
        make_mesh,
        replicate_state,
        shard_batch,
    )
    from mopoe_mimic_tpu.train.scan import epoch_index_matrix, make_train_epoch
    from mopoe_mimic_tpu.train.state import create_train_state
    from mopoe_mimic_tpu.train.step import make_train_step

    n_proc = jax.process_count()
    pid = jax.process_index()
    cfg = _tiny_cfg(jax.device_count())
    mesh = make_mesh(cfg)
    ds = SyntheticMimic(cfg, seed=0)

    # --- host-sharded streaming path -----------------------------------
    # every process draws the same global order and keeps its strided
    # slice; shard_batch reassembles the global array across processes.
    # The expected global batch is computable on every process: the
    # per-shard slices of the (shared) epoch order, concatenated in
    # process order.
    n_shards = emulate_shards if (n_proc == 1 and emulate_shards) else n_proc
    shard_loaders = [
        BatchLoader(
            ds, cfg.batch_size, shuffle=False, num_shards=n_shards, shard_index=i
        )
        for i in range(n_shards)
    ]
    shard_batches = [next(iter(ld))[0] for ld in shard_loaders]
    expected = {
        k: np.concatenate([sb[k] for sb in shard_batches])
        for k in shard_batches[0]
    }
    if n_proc > 1:
        loader = BatchLoader(ds, cfg.batch_size, shuffle=False)
        assert loader.num_shards == n_proc and loader.shard_index == pid
        batch0, _ = next(iter(loader))
        for k in batch0:  # this process's loader == its strided shard
            assert (batch0[k] == shard_batches[pid][k]).all(), k
        global_batch = shard_batch(mesh, batch0)
        _barrier("assembled_allgather")
        assembled = np.asarray(
            multihost_utils.process_allgather(global_batch["PA"], tiled=True)
        )
        assert (assembled == expected["PA"]).all(), (
            "assembled global batch != expected rows"
        )
    else:
        global_batch = shard_batch(mesh, expected)

    state = create_train_state(cfg, jax.random.PRNGKey(0), expected)
    state = replicate_state(mesh, state)
    step = make_train_step(cfg)
    _precompile(step, state, global_batch)
    _barrier("train_step_compiled")
    losses = []
    for _ in range(steps):
        state, metrics = step(state, global_batch)
        losses.append(float(jax.device_get(metrics["total_loss"])))
    assert all(np.isfinite(losses)), losses

    # --- row-sharded multi-host DeviceStore ----------------------------
    _barrier("device_store_upload")
    store = DeviceStore(ds, cfg, mesh=mesh, shard_rows=True)
    import jax.numpy as jnp

    _precompile(store._gather, store.cols, jnp.zeros(cfg.batch_size, jnp.int32))
    _barrier("store_gather_compiled")
    store_losses = []
    it = store.iter_epoch(0, cfg.batch_size, shuffle=False)
    for _ in range(steps):
        sb, _ = next(it)
        state, metrics = step(state, sb)
        store_losses.append(float(jax.device_get(metrics["total_loss"])))
    assert all(np.isfinite(store_losses)), store_losses
    # the store gather must reproduce the dataset rows under the store's
    # compact contract (uint8 quantization: float = round(x*255)/255,
    # data/device_store.py docstring)
    probe_idx = np.arange(cfg.batch_size)
    _barrier("store_probe_allgather")
    gathered = np.asarray(
        multihost_utils.process_allgather(store.gather(probe_idx)["PA"], tiled=True)
    )
    raw = np.asarray(ds.arrays["PA"][probe_idx], np.float32)
    expected_px = np.round(np.clip(raw, 0.0, 1.0) * 255.0).astype(np.uint8)
    expected_px = expected_px.astype(np.float32) / 255.0
    # tolerance: XLA may lower the on-device /255 dequant as a
    # multiply-by-reciprocal — up to 1 ulp from the host division
    err = np.abs(gathered - expected_px).max()
    assert err <= 1e-6, (
        f"row-sharded store gather != quantized dataset rows (max err {err})"
    )

    # --- scanned-epoch program -----------------------------------------
    train_epoch = make_train_epoch(cfg, store)
    idx_mat = epoch_index_matrix(store, 1, cfg.batch_size, steps_cap=steps)
    _precompile(train_epoch, state, store.cols, idx_mat)
    _barrier("scan_epoch_compiled")
    state, avg = train_epoch(state, store.cols, idx_mat)
    scan_loss = float(jax.device_get(avg["total_loss"]))
    assert np.isfinite(scan_loss), scan_loss

    # --- multi-host checkpoint: single-writer save, every-rank restore --
    # Reference parity: rank 0 is the only writer
    # (mimic/utils/experiment.py:391-393). Under a multi-controller
    # runtime the correct form of "rank-0-only" is orbax's primary-host
    # protocol: EVERY rank enters save()/restore() (orbax synchronizes
    # them with cross-process barriers and would deadlock a lone caller),
    # and only the primary host touches the shared filesystem.
    ckpt_restored_equal = None
    loss_eval_restored = None
    if ckpt_dir is not None:
        from mopoe_mimic_tpu.train.step import make_eval_step
        from mopoe_mimic_tpu.utils.checkpoints import CheckpointManager

        mgr = CheckpointManager(ckpt_dir, async_save=False)
        mgr.save(0, jax.device_get(state), force=True)
        mgr.wait_until_finished()
        _barrier("ckpt_saved")
        template = create_train_state(cfg, jax.random.PRNGKey(0), expected)
        epoch_r, restored = mgr.restore(template)
        mgr.close()
        assert epoch_r == 0, epoch_r
        # every rank's restored params must equal the live trained state
        live = jax.device_get(state.params)
        flat_live = jax.tree_util.tree_leaves(live)
        flat_rest = jax.tree_util.tree_leaves(restored.params)
        local_equal = all(
            np.allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
            for a, b in zip(flat_live, flat_rest)
        )
        # ... and identical ACROSS ranks: allgather a content fingerprint
        fp = np.asarray(
            [float(np.asarray(x, np.float64).sum()) for x in flat_rest],
            np.float64,
        )
        _barrier("ckpt_fingerprint")
        all_fp = np.asarray(multihost_utils.process_allgather(fp))
        all_fp = all_fp.reshape(n_proc, -1)
        ckpt_restored_equal = bool(
            local_equal and (all_fp == all_fp[0]).all()
        )
        assert ckpt_restored_equal, (
            "restored checkpoint state differs from live state or "
            "across controllers"
        )
        # one eval-suite call from the RESTORED state under
        # process_count>1: the jitted eval step over the global mesh —
        # every rank must compute the identical metric
        restored = replicate_state(mesh, restored)
        eval_step = make_eval_step(cfg)
        eval_rng = jax.random.PRNGKey(7)
        _precompile(eval_step, restored, global_batch, eval_rng)
        _barrier("eval_step_compiled")
        ev = eval_step(restored, global_batch, eval_rng)
        loss_eval_restored = float(jax.device_get(ev["total_loss"]))
        assert np.isfinite(loss_eval_restored)

    # --- heavy-eval suite under multi-controller ------------------------
    # run_eval_suite (lr-eval + coherence + IWAE) with per-host eval
    # shards assembled by parallel/mesh.allgather_rows at each eval's
    # collection point: every rank must report the IDENTICAL global
    # metrics. (Matches evaluation/runner.py; the reference has no
    # multi-host eval — its test() runs single-rank, run_epochs.py:190.)
    eval_metric_vec = None
    eval_metrics = None
    if heavy_evals:
        import os
        import tempfile

        from mopoe_mimic_tpu.evaluation.runner import run_eval_suite
        from mopoe_mimic_tpu.experiment import Experiment

        tmp = tempfile.mkdtemp(prefix=f"spmd_eval_rank{pid}_")
        ecfg = cfg.replace(
            dataset="testing_structured", synthetic_classes=3,
            synthetic_noise=0.25, synthetic_length=8 * cfg.batch_size,
            eval_lr=True, use_clf=True, calc_nll=True, calc_prd=False,
            clf_quick_epochs=1, num_imp_samples=2,
            num_training_samples_lr=2 * cfg.batch_size,
            dir_experiment=tmp, dir_clf=os.path.join(tmp, "clf"),
            async_plots=False,
        )
        # make_dirs=False: no per-rank CheckpointManager — orbax in
        # multi-controller mode synchronizes ranks on a SHARED directory;
        # per-rank private dirs would deadlock (the checkpoint phase
        # above covers multi-host checkpointing on a shared dir)
        eexp = Experiment(ecfg, make_dirs=False)
        sample = {
            k: v[: ecfg.batch_size] for k, v in eexp.dataset_train.arrays.items()
        }
        estate = create_train_state(ecfg, jax.random.PRNGKey(0), sample)
        estate = replicate_state(mesh, estate)
        _barrier("heavy_eval_start")
        ev = run_eval_suite(eexp, estate, epoch=0, mesh=mesh)
        eexp.drain_host_jobs()
        # run_eval_suite returns a FLAT {metric: float} dict (it
        # flattens internally, sep="_"); key-sort into a stable vector
        flat = sorted(
            (k, float(v)) for k, v in ev.items()
            if isinstance(v, (int, float)) and np.isfinite(v)
        )
        eval_metrics = dict(flat)
        vec = np.asarray([v for _, v in flat], np.float64)
        _barrier("heavy_eval_allgather")
        all_vecs = np.asarray(
            multihost_utils.process_allgather(vec)
        ).reshape(n_proc, -1)
        eval_metric_vec = all_vecs[0].tolist()
        assert (all_vecs == all_vecs[0]).all(), (
            "heavy-eval metric disagreement across controllers"
        )

    # --- cross-process agreement ---------------------------------------
    _barrier("final_allgather")
    tail = [scan_loss] + (
        [loss_eval_restored] if loss_eval_restored is not None else []
    )
    all_losses = np.asarray(
        multihost_utils.process_allgather(
            np.asarray(losses + store_losses + tail, np.float64)
        )
    ).reshape(n_proc, -1)
    agree = bool((all_losses == all_losses[0]).all())
    assert agree, f"process metric disagreement:\n{all_losses}"

    return {
        "ok": True,
        "process_id": pid,
        "num_processes": n_proc,
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
        "steps": steps,
        "losses_stream": losses,
        "losses_store": store_losses,
        "loss_scan_epoch": scan_loss,
        "ckpt_restored_equal": ckpt_restored_equal,
        "loss_eval_restored": loss_eval_restored,
        "heavy_eval_metrics": eval_metrics,
        "heavy_eval_vec": eval_metric_vec,
        "cross_process_agreement": agree,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (auto on Cloud TPU)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for CI runs)")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--emulate-shards", type=int, default=0,
                    help="single-process control: reproduce the batch "
                    "ordering of a K-process launch (see run())")
    ap.add_argument("--out", default=None, help="write the report JSON here")
    ap.add_argument("--ckpt-dir", default=None,
                    help="shared dir for the multi-host checkpoint phase: "
                    "rank 0 saves, every rank restores + verifies "
                    "(reference rank-0-only save, experiment.py:391-393)")
    ap.add_argument("--heavy-evals", action="store_true",
                    help="also run the heavy-eval suite (lr-eval + "
                    "coherence + IWAE) under the multi-controller mesh "
                    "and assert rank-identical global metrics")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/mopoe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if args.num_processes and args.num_processes > 1:
        from mopoe_mimic_tpu.parallel.mesh import init_multihost

        init_multihost(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    report = run(steps=args.steps, emulate_shards=args.emulate_shards,
                 ckpt_dir=args.ckpt_dir, heavy_evals=args.heavy_evals)
    out = json.dumps(report)
    print(out, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    if args.num_processes and args.num_processes > 1:
        jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
