"""Classifier workload: densenet crop input path, crop-mean predictions,
results-CSV twin (reference: main_train_clf_mimic.py:49-199,
classifiers/utils.py:47-89)."""

import numpy as np
import pandas as pd
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.train.clf_trainer import (
    make_classifier, make_clf_input_fn, train_classifier,
)


def test_clf_input_fn_densenet_crops():
    cfg = MopoeConfig(
        dataset="testing", img_size=64, img_clf_type="densenet", n_crops=5,
        batch_size=2,
    )
    prep = make_clf_input_fn(cfg, "PA")
    x = np.random.default_rng(0).random((2, 64, 64, 1)).astype(np.float32)
    out = prep(x)
    # RGB + ImageNet-normalize + FiveCrop(224), crops flattened onto batch
    assert out.shape == (10, 224, 224, 3)
    assert out.min() < 0  # normalized (not raw [0, 1])
    # ten-crop doubles via horizontal flips
    cfg10 = cfg.replace(n_crops=10)
    assert make_clf_input_fn(cfg10, "PA")(x).shape == (20, 224, 224, 3)
    # text / resnet paths are identity
    assert make_clf_input_fn(cfg, "text")(x) is x
    assert make_clf_input_fn(cfg.replace(img_clf_type="resnet"), "PA")(x) is x


def test_densenet_classifier_selected():
    cfg = MopoeConfig(dataset="testing", img_clf_type="densenet", n_crops=5)
    from mopoe_mimic_tpu.models.densenet import CheXNet

    m = make_classifier(cfg, "PA", 3)
    assert isinstance(m, CheXNet) and m.n_crops == 5


@pytest.mark.slow
def test_train_classifier_writes_csv_twin(tmp_path):
    cfg = MopoeConfig(
        dataset="testing", img_size=64, batch_size=8, DIM_img=2, DIM_text=2,
        compute_dtype="float32", seed=0, steps_per_training_epoch=1,
        dir_clf=str(tmp_path / "clf"),
    )
    ds_train = SyntheticMimic(cfg, seed=0, length=16)
    ds_eval = SyntheticMimic(cfg, seed=1, length=16)
    state, results = train_classifier(
        cfg, "PA", ds_train, ds_eval, n_labels=3, max_epochs=2,
    )
    assert results, "best eval metrics must be returned"
    csv = tmp_path / "clf" / "clf_experiments_dataframe.csv"
    assert csv.exists(), "clf results CSV twin missing"
    row = pd.read_csv(csv).iloc[0]
    assert row["modality"] == "PA"
    assert any(c.startswith("best_") for c in row.index)


def test_parameter_grid_enumeration():
    from mopoe_mimic_tpu.train.grid_search import parameter_grid

    pts = list(parameter_grid({"initial_learning_rate": [1e-3, 1e-4],
                               "clf_loss": ["dice"]}))
    assert len(pts) == 2
    assert {p["initial_learning_rate"] for p in pts} == {1e-3, 1e-4}
    assert all(p["clf_loss"] == "dice" for p in pts)


@pytest.mark.slow
def test_grid_search_clf_smoke(tmp_path):
    from mopoe_mimic_tpu.train.grid_search import grid_search_clf

    cfg = MopoeConfig(
        dataset="testing", img_size=64, batch_size=8, DIM_img=2, DIM_text=2,
        compute_dtype="float32", seed=0, steps_per_training_epoch=1,
        dir_clf=str(tmp_path / "clf"),
    )
    ds = SyntheticMimic(cfg, seed=0, length=16)
    df = grid_search_clf(
        cfg, "PA", ds, SyntheticMimic(cfg, seed=1, length=16), 3,
        grid={"initial_learning_rate": [1e-3, 1e-4]},
        results_csv=str(tmp_path / "grid.csv"), max_epochs=1,
    )
    assert len(df) == 2 and (tmp_path / "grid.csv").exists()
    assert "initial_learning_rate" in df.columns


def test_text_clf_follows_data_encoding():
    """A char-encoded run must get a char text classifier even though
    text_clf_type defaults to 'word' — the mismatch fed a word embedding
    one-hot char tensors and crashed Dense init (found by CLI drive r3)."""
    import jax
    import numpy as np

    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.train.clf_trainer import make_classifier

    cfg = MopoeConfig(dataset="testing", batch_size=4, class_dim=4, DIM_img=2,
                      DIM_text=2, img_size=64, text_encoding="char",
                      compute_dtype="float32")
    assert cfg.text_clf_type == "word"  # the mismatched default
    model = make_classifier(cfg, "text", 3)
    assert model.text_encoding == "char"
    x = np.zeros((2, cfg.len_sequence, 71), np.float32)
    x[:, :, 0] = 1.0
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, train=True)
    probs = model.apply(v, x, train=False)
    assert probs.shape == (2, 3)
