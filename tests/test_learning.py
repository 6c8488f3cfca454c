"""End-to-end LEARNING test: on structured tri-modal synthetic data the
MoPoE must (a) reduce the ELBO substantially and (b) encode the shared
latent class into every subset posterior. This is the correctness test the
noise fixture can't provide — cross-modal structure must actually be
learned. CPU-sized; the TPU-scale version lives in examples/learning_demo.py."""

import jax
import numpy as np
import pytest
from sklearn.linear_model import LogisticRegression

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.models.mmvae import MMVae
from mopoe_mimic_tpu.train import create_train_state, make_train_step


@pytest.mark.slow
def test_mopoe_learns_shared_latent():
    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing", img_size=64, DIM_img=4,
        DIM_text=4, class_dim=8, text_encoding="word", vocab_size=10,
        batch_size=32, initial_learning_rate=1e-4, compute_dtype="float32",
        seed=0,
    )
    ds = SyntheticMimic(cfg, seed=0, length=128, structured=True)
    loader = BatchLoader(ds, cfg.batch_size, shuffle=True, seed=0)
    b0 = next(iter(loader))[0]
    state = create_train_state(cfg, jax.random.PRNGKey(0), b0)
    step = make_train_step(cfg)
    first_loss = None
    for epoch in range(40):
        loader.set_epoch(epoch)
        for batch, _ in loader:
            state, m = step(state, batch)
        if first_loss is None:
            first_loss = float(m["total_loss"])
    last_loss = float(m["total_loss"])
    assert last_loss < 0.8 * first_loss, (first_loss, last_loss)

    model = MMVae(cfg)

    @jax.jit
    def infer(params, bs, batch):
        out = model.apply(
            {"params": params, "batch_stats": bs}, batch, train=False,
            method=lambda mo, b, train: mo.inference(b, train=train),
        )
        return {k: mu for k, (mu, lv) in out["subsets"].items()}

    means = jax.device_get(
        infer(state.params, state.batch_stats, {k: v[:128] for k, v in ds.arrays.items()})
    )
    classes = ds.classes[:128]
    x = np.nan_to_num(means["Lateral_PA_text"])
    clf = LogisticRegression(max_iter=500).fit(x[:96], classes[:96])
    acc = clf.score(x[96:], classes[96:])
    assert acc >= 0.8, acc


def test_structured_dataset_mode_via_experiment(tmp_path):
    """dataset='testing_structured' wires the learnable synthetic through
    the Experiment container (round-2 full-metrics run rides this path)."""
    from mopoe_mimic_tpu.experiment import Experiment

    cfg = MopoeConfig(
        method="joint_elbo", dataset="testing_structured", img_size=64,
        DIM_img=2, DIM_text=2, class_dim=4, text_encoding="word",
        vocab_size=10, batch_size=8, synthetic_length=32,
        compute_dtype="float32", seed=0,
        dir_experiment=str(tmp_path / "runs"),
    )
    exp = Experiment(cfg)
    assert exp.dataset_train.classes is not None
    assert len(exp.dataset_train) == 32 and len(exp.dataset_test) == 8
    batch, labels = next(iter(exp.make_loaders()[0]))
    # labels one-hot the latent class; text repeats class+1
    assert set(np.unique(labels)) <= {0.0, 1.0}
    assert (labels.sum(axis=1) == 1).all()
    cls = labels.argmax(axis=1)
    assert (batch["text"][:, 0] >= 1).all()
