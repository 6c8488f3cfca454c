"""Golden parity for the classification Metrics against the ACTUAL
reference class (mimic/networks/classifiers/utils.py:286-413), loaded
standalone with the torchvision-dependent network imports stubbed.

All confusion-matrix metrics (accuracy, recall, specificity, precision,
f1, jaccard, dice) and the per-label counts must be float-equal. mean_AP
intentionally differs: the reference swaps sklearn's
``average_precision_score(y_true, y_score)`` argument order
(classifiers/utils.py:393-400) — the test executes the reference call to
show our value equals the CORRECT call and theirs equals the swapped one
(PARITY.md deviations table)."""

import importlib.util
import logging
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference checkout absent")

torch = pytest.importorskip("torch")

from mopoe_mimic_tpu.evaluation.metrics import Metrics as OurMetrics


@pytest.fixture(scope="module")
def ref_metrics_cls():
    names = [
        "mimic", "mimic.networks", "mimic.networks.CheXNet",
        "mimic.networks.ConvNetworkImgClf", "mimic.networks.ConvNetworkTextClf",
        "mimic.utils", "mimic.utils.filehandling",
        "mimic.networks.classifiers", "mimic.networks.classifiers.utils",
    ]
    saved = {k: sys.modules.get(k) for k in names}
    try:
        mimic_pkg = types.ModuleType("mimic")
        mimic_pkg.log = logging.getLogger("ref_golden_metrics")
        sys.modules["mimic"] = mimic_pkg
        sys.modules["mimic.networks"] = types.ModuleType("mimic.networks")
        sys.modules["mimic.utils"] = types.ModuleType("mimic.utils")
        for stub_name, attrs in (
            ("mimic.networks.CheXNet", ("CheXNet",)),
            ("mimic.networks.ConvNetworkImgClf", ("ClfImg",)),
            ("mimic.networks.ConvNetworkTextClf", ("ClfText",)),
        ):
            stub = types.ModuleType(stub_name)
            for a in attrs:
                setattr(stub, a, object)
            sys.modules[stub_name] = stub

        def _load(name, rel):
            spec = importlib.util.spec_from_file_location(name, REF / rel)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            return mod

        _load("mimic.utils.filehandling", "mimic/utils/filehandling.py")
        sys.modules["mimic.networks.classifiers"] = types.ModuleType(
            "mimic.networks.classifiers")
        cu = _load("mimic.networks.classifiers.utils",
                   "mimic/networks/classifiers/utils.py")
        yield cu.Metrics
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_confusion_metrics_and_counts_match_reference(ref_metrics_cls):
    # NOTE: the reference's .evaluate() cannot even run on continuous
    # prediction scores under modern sklearn — its swapped-args mean_AP
    # (classifiers/utils.py:393-400) raises "continuous format is not
    # supported" — so the confusion methods are executed directly, in
    # evaluate()'s order (they chain hidden state: recall sets TP/FN,
    # specificity sets TN/FP, ...).
    rng = np.random.default_rng(5)
    pred = rng.random((64, 3))
    gt = (rng.random((64, 3)) > 0.6).astype(np.float64)
    labels = ["Lung Opacity", "Pleural Effusion", "Support Devices"]

    rm = ref_metrics_cls(torch.from_numpy(pred), torch.from_numpy(gt), labels)
    ref = {
        "accuracy": rm.accuracy(), "recall": rm.recall(),
        "specificity": rm.specificity(), "precision": rm.precision(),
        "f1": rm.f1(), "jaccard": rm.jaccard(), "dice": rm.dice(),
    }
    ref_counts = rm.counts()
    ours = OurMetrics(pred, gt, labels).evaluate()

    for key, v in ref.items():
        assert ours[key][0] == pytest.approx(v, rel=1e-9), key
    for lbl in labels:
        assert ours[f"pred_count_{lbl}"][0] == ref_counts[f"pred_count_{lbl}"][0]
        assert ours[f"gt_count_{lbl}"][0] == ref_counts[f"gt_count_{lbl}"][0]


def test_mean_ap_fixes_reference_swapped_args(ref_metrics_cls):
    # executed live: with binary predictions (where the swapped call is
    # still computable) the reference's mean_AP equals sklearn with
    # SWAPPED arguments; ours equals the correct (y_true=groundtruth)
    # call. On continuous scores the reference call CRASHES outright
    # under modern sklearn (see test above).
    from sklearn.metrics import average_precision_score

    rng = np.random.default_rng(6)
    pred = (rng.random((64, 2)) > 0.4).astype(np.float64)
    gt = (rng.random((64, 2)) > 0.5).astype(np.float64)
    labels = ["a", "b"]

    ref = ref_metrics_cls(torch.from_numpy(pred), torch.from_numpy(gt),
                          labels).evaluate()
    ours = OurMetrics(pred, gt, labels).evaluate()

    correct = average_precision_score(gt.ravel(), pred.ravel())
    swapped = average_precision_score(pred.ravel(), gt.ravel())
    assert ours["mean_AP_total"][0] == pytest.approx(correct, rel=1e-9)
    assert ref["mean_AP_total"][0] == pytest.approx(swapped, rel=1e-9)
    assert abs(correct - swapped) > 1e-6  # the bug is observable here
