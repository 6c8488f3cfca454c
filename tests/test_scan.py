"""Scanned-epoch trainer (train/scan.py): one jitted lax.scan per epoch
must reproduce the per-step path's numerics exactly — same step body, same
epoch order, same rng chains."""

import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.experiment import Experiment
from mopoe_mimic_tpu.train.loop import run_epochs


def _cfg(tmp_path, **kw):
    base = dict(
        method="joint_elbo", dataset="testing_structured", batch_size=8,
        class_dim=4, DIM_img=2, DIM_text=2, img_size=64,
        text_encoding="word", vocab_size=50, compute_dtype="float32",
        end_epoch=2, steps_per_training_epoch=3, eval_freq=100, seed=7,
        device_resident_data=True, dir_experiment=str(tmp_path),
    )
    base.update(kw)
    return MopoeConfig(**base)


@pytest.mark.slow
def test_scan_epochs_match_per_step_path(tmp_path):
    """scan_epochs=True/False must agree on train AND test epoch means
    (identical batches via DeviceStore.epoch_order, identical train rng
    chain through state.rng, identical eval rng split chain through the
    scan carry)."""
    import jax

    results = {}
    for scan in (True, False):
        cfg = _cfg(tmp_path / str(scan), scan_epochs=scan)
        exp = Experiment(cfg)
        state = exp.init_state()  # same seed → same init both times
        out = run_epochs(exp, state=state)
        results[scan] = out

    # identical op sequence; scan-vs-unrolled compilation may reorder
    # float reductions → tight-but-not-bitwise tolerances. The test pass
    # gets a looser bound: near-init eval-mode BN (uncalibrated running
    # stats under the a=2.0 skip amplification, docs/STABILITY.md) puts
    # test losses at ~1e7+, where reduction-order noise is amplified.
    for split, tol in (("train", 1e-4), ("test", 2e-2)):
        a = float(results[True][split]["total_loss"])
        b = float(results[False][split]["total_loss"])
        assert np.isfinite(b)
        assert abs(a - b) / max(abs(b), 1.0) < tol, (split, a, b)
    # params: global relative-L2 check. Elementwise comparison is too
    # strict — near-zero biases compound Adam sign flips from reduction-
    # order noise. Same batches+rng keep the global distance ~1e-4;
    # wrong batches or a broken rng chain would push it to ~1e-1 (every
    # param walks ±lr independently).
    pa = np.concatenate([
        np.asarray(l).ravel()
        for l in jax.tree_util.tree_leaves(results[True]["state"].params)
    ])
    pb = np.concatenate([
        np.asarray(l).ravel()
        for l in jax.tree_util.tree_leaves(results[False]["state"].params)
    ])
    rel = np.linalg.norm(pa - pb) / np.linalg.norm(pb)
    assert rel < 1e-3, rel


def test_epoch_index_matrix_matches_iter_epoch():
    """The scan's index matrix is the same draw iter_epoch makes
    (drop_last semantics, identical rng stream, steps cap)."""
    from mopoe_mimic_tpu.data.device_store import DeviceStore
    from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
    from mopoe_mimic_tpu.train.scan import epoch_index_matrix

    cfg = MopoeConfig(
        dataset="testing", batch_size=4, img_size=64, text_encoding="word",
        vocab_size=50, class_dim=4, DIM_img=2, DIM_text=2,
    )
    ds = SyntheticMimic(cfg, seed=0, length=19)
    store = DeviceStore(ds, cfg)
    mat = epoch_index_matrix(store, epoch=2, batch_size=4, seed=5)
    assert mat.shape == (4, 4)  # 19 // 4, drop_last
    order = store.epoch_order(2, seed=5)
    np.testing.assert_array_equal(mat.ravel(), order[:16])
    capped = epoch_index_matrix(store, epoch=2, batch_size=4, seed=5,
                                steps_cap=2)
    np.testing.assert_array_equal(capped, mat[:2])
    # weighted draw respects the same stream as iter_epoch's
    w = epoch_index_matrix(store, epoch=1, batch_size=4, seed=5,
                           weighted=True)
    w_order = store.epoch_order(1, seed=5, weighted=True)
    np.testing.assert_array_equal(w.ravel(), w_order[:16])
