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
