"""Plot generation: cond-gen grids must contain one row per modality —
INCLUDING the PIL-rendered text row (reference renders text into the same
grid, mimic/utils/plot.py:30-67)."""

import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.experiment import Experiment
from mopoe_mimic_tpu.utils.plotting import generate_plots, text_to_pil, _to_rgb


def test_text_to_pil_shape_and_range():
    frame = text_to_pil(["hello", " ", "world"], size=(64, 64))
    assert frame.shape == (64, 64, 3)
    assert frame.min() >= 0.0 and frame.max() <= 1.0
    assert frame.std() > 0.0, "rendered text must not be a blank frame"


def test_to_rgb():
    g = np.zeros((2, 8, 8, 1), np.float32)
    assert _to_rgb(g).shape == (2, 8, 8, 3)
    rgb = np.zeros((2, 8, 8, 3), np.float32)
    assert _to_rgb(rgb) is rgb


@pytest.mark.slow
def test_cond_gen_grids_include_text_rows(tmp_path):
    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", img_size=64, DIM_img=2,
        DIM_text=2, class_dim=4, text_encoding="word", vocab_size=20,
        batch_size=4, compute_dtype="float32", seed=0,
        dir_experiment=str(tmp_path / "runs"),
    )
    exp = Experiment(cfg)
    state = exp.init_state()
    plots = generate_plots(exp, state, epoch=0)
    cond_keys = [k for k in plots if k.startswith("cond_gen/")]
    assert len(cond_keys) == 7  # every non-empty subset
    n_mods = len(cfg.modality_names)
    for k in cond_keys:
        grid = plots[k]
        # 4 frames per row, one row per modality (text included), RGB
        rows = grid.shape[0] // cfg.img_size
        assert rows == n_mods, f"{k}: text row missing from cond-gen grid"
        assert grid.shape[-1] == 3
    assert any(k.startswith("random/text") for k in plots)


def test_host_job_worker_serializes_and_drains(tmp_path):
    """submit_host_job: jobs run in submission order on ONE worker;
    drain_host_jobs blocks until all are done; a failing job is logged,
    not raised (plot renders were already warn-only)."""
    import time

    cfg = MopoeConfig(dataset="testing", batch_size=2, img_size=64,
                      DIM_img=2, DIM_text=2, class_dim=4,
                      text_encoding="word", vocab_size=20,
                      dir_experiment=str(tmp_path / "runs"))
    exp = Experiment(cfg)
    order = []
    exp.submit_host_job(lambda: (time.sleep(0.05), order.append(1)), name="a")
    exp.submit_host_job(lambda: order.append(2), name="b")
    exp.submit_host_job(lambda: 1 / 0, name="boom")  # must not propagate
    exp.submit_host_job(lambda: order.append(3), name="c")
    exp.drain_host_jobs()
    assert order == [1, 2, 3]
    exp.drain_host_jobs()  # idempotent


@pytest.mark.slow
def test_async_plot_render_lands_after_drain(tmp_path):
    """collect → async render: the eval round only pays the device/
    download phase; PNGs and grids appear once the host worker drains."""
    from mopoe_mimic_tpu.utils.plotting import (
        collect_plot_arrays, render_plot_arrays,
    )
    import os

    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", img_size=64, DIM_img=2,
        DIM_text=2, class_dim=4, text_encoding="word", vocab_size=20,
        batch_size=4, compute_dtype="float32", seed=0, save_figure=True,
        dir_experiment=str(tmp_path / "runs"),
    )
    exp = Experiment(cfg)
    state = exp.init_state()
    data = collect_plot_arrays(exp, state, epoch=0)
    assert "gen" in data and "cond" in data  # device phase complete
    rendered = {}
    exp.submit_host_job(
        lambda: rendered.update(render_plot_arrays(exp, data, 0)),
        name="plot render",
    )
    exp.drain_host_jobs()
    assert any(k.startswith("cond_gen/") for k in rendered)
    pngs = os.listdir(exp.paths["plot_random"])
    assert pngs, "async render must still write save_figure PNGs"
    assert all(p.startswith("random_") for p in pngs)
    cond_pngs = os.listdir(exp.paths["plot_cond"])
    assert cond_pngs, "cond-gen grids must land in plots/cond_gen (parity dirs)"
