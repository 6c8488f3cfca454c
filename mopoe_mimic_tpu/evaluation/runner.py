"""Heavy-eval orchestration, called from the train loop every eval_freq
epochs (parity: test() at mimic/run_epochs.py:148-228 — generate_plots,
eval_lr, use_clf coherence, calc_nll, calc_prd)."""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import numpy as np

from mopoe_mimic_tpu.utils.logger import log
from mopoe_mimic_tpu.utils.meters import flatten_metrics


def run_eval_suite(
    exp, state, epoch: int, mesh=None, max_batches: Optional[int] = None
) -> Dict[str, Any]:
    """Run every enabled heavy eval. ``max_batches`` caps each eval's test
    coverage; None defers to ``cfg.eval_max_batches`` whose default (0)
    means the FULL test set, matching the reference's test() pass
    (mimic/run_epochs.py:148-228). Any cap is logged — no silent caps."""
    cfg = exp.cfg
    if max_batches is None:
        max_batches = cfg.eval_max_batches
    if max_batches:
        log.info(
            f"heavy evals CAPPED at {max_batches} test batches "
            f"(~{max_batches * cfg.effective_eval_batch_size} samples) — "
            f"metrics are not "
            f"comparable to full-test-set reference numbers"
        )
    results: Dict[str, Any] = {}
    timings: Dict[str, float] = {}
    t_round = time.perf_counter()

    if cfg.eval_lr:
        from mopoe_mimic_tpu.evaluation.representation import (
            test_clf_lr_all_subsets, train_clf_lr_all_subsets,
        )

        log.info("eval: latent-representation classifiers")
        t0 = time.perf_counter()
        clf_lr = train_clf_lr_all_subsets(exp, state, mesh=mesh)
        lr_eval = test_clf_lr_all_subsets(exp, state, clf_lr, mesh=mesh)
        timings["lr_eval_s"] = time.perf_counter() - t0
        results["lr_eval"] = lr_eval
        for s_key, metrics in lr_eval.items():
            exp.tb_logger.write_epoch(f"lr_eval/{s_key}", epoch, metrics)

    if cfg.use_clf:
        from mopoe_mimic_tpu.evaluation.clf_loader import load_or_train_classifiers
        from mopoe_mimic_tpu.evaluation.coherence import test_generation

        log.info("eval: generation coherence")
        t0 = time.perf_counter()
        evaluator = load_or_train_classifiers(exp)
        timings["clf_load_or_train_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        gen_eval = test_generation(exp, state, evaluator, max_batches=max_batches)
        timings["coherence_s"] = time.perf_counter() - t0
        results["gen_eval"] = gen_eval
        exp.tb_logger.write_epoch("coherence", epoch, gen_eval)

    if cfg.calc_nll:
        from mopoe_mimic_tpu.evaluation.likelihood import estimate_likelihoods

        log.info("eval: importance-weighted likelihoods")
        t0 = time.perf_counter()
        lhoods = estimate_likelihoods(exp, state, mesh=mesh, max_batches=max_batches)
        timings["nll_s"] = time.perf_counter() - t0
        results["likelihoods"] = lhoods
        exp.tb_logger.write_epoch("likelihoods", epoch, lhoods)

    if cfg.calc_prd and (epoch + 1) % cfg.eval_freq_fid == 0:
        from mopoe_mimic_tpu.evaluation.sample_quality import calc_prd_score
        from mopoe_mimic_tpu.evaluation.embedding import make_default_embedder

        log.info("eval: PRD/FID sample quality")
        t0 = time.perf_counter()
        try:
            embed = make_default_embedder(exp)
            timings["embedder_s"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            prd = calc_prd_score(exp, state, embed, max_batches=max_batches)
            timings["prd_s"] = time.perf_counter() - t0
            results["prd"] = prd
            exp.tb_logger.write_epoch("prd", epoch, prd)
        except (ImportError, FileNotFoundError) as e:
            # missing optional dependency / embedder weights — a legitimate
            # skip, everything else propagates (a broken eval path must not
            # look like a clean run)
            log.warning(f"PRD/FID skipped: {e}")

    try:
        from mopoe_mimic_tpu.utils.plotting import (
            collect_plot_arrays, render_plot_arrays,
        )

        t0 = time.perf_counter()
        # dispatch-only: collect returns DEVICE arrays; the blocking
        # device→host download moved into the render job below, taking
        # the last plot cost off the epoch path (VERDICT r3 #8)
        plot_data = collect_plot_arrays(exp, state, epoch)
        timings["plots_dispatch_s"] = time.perf_counter() - t0

        def _render(data=plot_data, ep=epoch):
            import jax as _jax

            data = _jax.device_get(data)  # the actual download
            for tag, img in render_plot_arrays(exp, data, ep).items():
                exp.tb_logger.write_image(tag, img, ep)

        if cfg.async_plots:
            # rendering is pure host work (PIL/matplotlib, ~20 s/round on
            # this 1-core box — the dominant recurring eval cost after the
            # round-3 device-side fixes, RESULTS_r3). Hand it to the
            # experiment's worker so it overlaps the next scanned train
            # epoch instead of blocking the round; drained at end of run.
            exp.submit_host_job(_render, name=f"plot render (epoch {epoch})")
        else:
            t0 = time.perf_counter()
            _render()
            timings["plots_render_s"] = time.perf_counter() - t0
    except Exception as e:
        log.warning(f"plot generation FAILED: {e!r}", exc_info=True)

    if timings:
        total = time.perf_counter() - t_round
        split = ", ".join(f"{k}={v:.1f}" for k, v in timings.items())
        log.info(f"eval round: {total:.1f}s total ({split})")
    return flatten_metrics(results, sep="_") if results else {}
