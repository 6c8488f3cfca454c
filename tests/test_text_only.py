"""Text-only model (parity: VAETextMimic, VAEtrimodalMimic.py:166-256 —
selected by --only_text_modality): single modality, single subset, full
train step."""

import jax
import numpy as np

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.train import create_train_state, make_train_step


def test_text_only_model_trains():
    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", only_text_modality=True,
        batch_size=8, class_dim=4, DIM_text=2, text_encoding="word",
        vocab_size=50, compute_dtype="float32",
    )
    assert cfg.modality_names == ("text",)
    ds = SyntheticMimic(cfg, seed=0)
    sample, _ = ds[0]
    assert set(sample.keys()) == {"text"}
    loader = BatchLoader(ds, cfg.batch_size, shuffle=True, seed=0)
    batch0 = next(iter(loader))[0]
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch0)
    step = make_train_step(cfg)
    state, metrics = step(state, batch0)
    assert np.isfinite(float(metrics["total_loss"]))
    assert list(metrics["klds"].keys()) == ["text"]
    assert list(metrics["log_probs"].keys()) == ["text"]
