"""Unit tests for evaluation math: Metrics, BLEU, FID/PRD, IWAE pieces."""

import numpy as np
import pytest

from mopoe_mimic_tpu.evaluation.bleu import common_word_count, corpus_bleu
from mopoe_mimic_tpu.evaluation.metrics import Metrics
from mopoe_mimic_tpu.evaluation.sample_quality import (
    calculate_fid, compute_prd, compute_prd_from_embedding, prd_to_max_f_beta_pair,
)


def test_metrics_perfect_prediction():
    pred = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    m = Metrics(pred, pred, ["a", "b"]).evaluate()
    assert m["accuracy"][0] == 1.0
    assert abs(m["dice"][0] - 1.0) < 1e-3
    assert abs(m["mean_AP_total"][0] - 1.0) < 1e-6
    assert m["pred_count_a"][0] == 2.0


def test_metrics_known_confusion():
    # pred: [1,1,0,0], gt: [1,0,1,0] → TP=1 FP=1 FN=1 TN=1
    pred = np.array([[1], [1], [0], [0]], dtype=float)
    gt = np.array([[1], [0], [1], [0]], dtype=float)
    m = Metrics(pred, gt, ["x"]).evaluate()
    assert abs(m["accuracy"][0] - 0.5) < 1e-6
    assert abs(m["recall"][0] - 0.5) < 1e-4
    assert abs(m["precision"][0] - 0.5) < 1e-4
    assert abs(m["jaccard"][0] - 1 / 3) < 1e-4


def test_corpus_bleu_identity_and_mismatch():
    refs = [["the", "cat", "sat"], ["a", "dog", "ran", "far"]]
    out = corpus_bleu(refs, refs)
    for n in range(1, 5):
        assert abs(out[f"bleu_{n}"] - (1.0 if n <= 3 else out["bleu_4"])) < 1e-6
    out2 = corpus_bleu(refs, [["xx"], ["yy"]])
    assert out2["bleu_1"] == 0.0
    assert common_word_count(refs[0], ["the", "zz"]) == 1


def _nltk_quintuple(refs, hyps):
    """The reference's exact five calls (coherence.py:302-310): nltk
    corpus_bleu with per-n weights + cumulative, method4 smoothing."""
    from nltk.translate.bleu_score import SmoothingFunction
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

    cc = SmoothingFunction()
    wrapped = [[r] for r in refs]  # one reference per hypothesis
    return {
        "bleu_1": nltk_bleu(wrapped, hyps, weights=(1, 0, 0, 0),
                            smoothing_function=cc.method4),
        "bleu_2": nltk_bleu(wrapped, hyps, weights=(0, 1, 0, 0),
                            smoothing_function=cc.method4),
        "bleu_3": nltk_bleu(wrapped, hyps, weights=(0, 0, 1, 0),
                            smoothing_function=cc.method4),
        "bleu_4": nltk_bleu(wrapped, hyps, weights=(0, 0, 0, 1),
                            smoothing_function=cc.method4),
        "bleu": nltk_bleu(wrapped, hyps, smoothing_function=cc.method4),
    }


def test_corpus_bleu_golden_vs_nltk():
    """Golden parity (VERDICT r2 #2): our one-pass corpus BLEU equals
    nltk's corpus_bleu(weights, smoothing_function=method4) on fixed token
    sets covering partial overlap, zero higher-order matches (smoothing
    path), brevity penalty, and empty hypotheses."""
    pytest = __import__("pytest")
    pytest.importorskip("nltk")

    cases = [
        # partial overlap, realistic report-like sentences
        (
            [["no", "focal", "consolidation", "pleural", "effusion", "or",
              "pneumothorax"],
             ["mild", "pulmonary", "edema", "with", "small", "effusions"],
             ["the", "lungs", "are", "clear"]],
            [["no", "consolidation", "pleural", "effusion", "seen"],
             ["pulmonary", "edema", "with", "effusions", "noted", "today"],
             ["lungs", "clear"]],
        ),
        # exact match
        (
            [["a", "b", "c", "d", "e"]],
            [["a", "b", "c", "d", "e"]],
        ),
        # unigram-only overlap → bleu_2..4 exercise method4 smoothing
        (
            [["a", "x", "b", "y", "c"]],
            [["a", "q", "b", "r", "c"]],
        ),
        # short hypothesis → brevity penalty < 1
        (
            [["a", "b", "c", "d", "e", "f", "g", "h"]],
            [["a", "b", "c"]],
        ),
        # an empty hypothesis mixed in (denominator-min-1 quirk)
        (
            [["a", "b", "c"], ["d", "e", "f"]],
            [["a", "b", "c"], []],
        ),
        # repeated tokens (clipping path)
        (
            [["the", "the", "cat"]],
            [["the", "the", "the", "the"]],
        ),
    ]
    for refs, hyps in cases:
        ours = corpus_bleu(refs, hyps)
        golden = _nltk_quintuple(refs, hyps)
        for k, v in golden.items():
            assert abs(ours[k] - v) < 1e-12, (k, ours[k], v, refs, hyps)


def test_nbr_common_words():
    from mopoe_mimic_tpu.evaluation.bleu import nbr_common_words

    refs = [["a", "b", "c"], ["d", "e"]]
    hyps = [["a", "c", "x"], ["q"]]
    # per-sample overlaps: 2 and 0 → mean 1.0 (coherence.py:303)
    assert nbr_common_words(refs, hyps) == 1.0


def test_fid_zero_for_identical_sets():
    rng = np.random.default_rng(0)
    acts = rng.normal(size=(200, 8))
    assert abs(calculate_fid(acts, acts)) < 1e-4
    shifted = acts + 5.0
    assert calculate_fid(acts, shifted) > 20.0


def test_frechet_eigh_matches_scipy_sqrtm():
    # the eigh-based tr√(Σ₁Σ₂) must equal the classical complex-Schur
    # sqrtm value (pytorch-fid semantics), incl. on rank-deficient Σ
    from scipy import linalg

    from mopoe_mimic_tpu.evaluation.sample_quality import frechet_distance

    rng = np.random.default_rng(3)
    for n_rows in (50, 6):  # 6 rows × 8 dims → singular covariance
        a = rng.normal(size=(n_rows, 8))
        b = rng.normal(size=(n_rows, 8)) * 1.7 + 0.4
        mu1, s1 = a.mean(0), np.cov(a, rowvar=False)
        mu2, s2 = b.mean(0), np.cov(b, rowvar=False)
        covmean, _ = linalg.sqrtm(s1 @ s2, disp=False)
        ref = float((mu1 - mu2) @ (mu1 - mu2) + np.trace(s1) + np.trace(s2)
                    - 2 * np.trace(covmean.real))
        got = frechet_distance(mu1, s1, mu2, s2)
        assert got == pytest.approx(ref, rel=1e-6, abs=1e-6)


def test_prd_identical_distributions_high_precision_recall():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(300, 4))
    b = rng.normal(size=(300, 4))
    p, r = compute_prd_from_embedding(a, b, num_clusters=5, num_runs=2)
    f8, f18 = prd_to_max_f_beta_pair(p, r)
    assert f8 > 0.8 and f18 > 0.8
    # disjoint distributions → low curve
    c = rng.normal(loc=50.0, size=(300, 4))
    p2, r2 = compute_prd_from_embedding(a, c, num_clusters=5, num_runs=2)
    assert np.mean(p2) < np.mean(p) / 2


def test_prd_histogram_math():
    ref = np.array([0.5, 0.5])
    ev = np.array([0.5, 0.5])
    p, r = compute_prd(ref, ev)
    assert p.max() > 0.99 and r.max() > 0.99


def test_corpus_bleu_ids_matches_token_path_and_nltk():
    """The integer-id fast path scores bit-identically to decoding ids to
    tokens and running the token-based corpus scan (and hence to nltk)."""
    from mopoe_mimic_tpu.evaluation.bleu import (
        corpus_bleu_ids, nbr_common_words, nbr_common_words_ids,
    )

    rng = np.random.default_rng(3)
    for vocab, L in ((40, 32), (3517, 128)):
        refs = rng.integers(0, vocab, size=(16, L))
        # half-noisy copies → realistic partial n-gram overlap
        hyps = refs.copy()
        mask = rng.random(refs.shape) < 0.4
        hyps[mask] = rng.integers(0, vocab, size=int(mask.sum()))
        table = [f"tok{i}" for i in range(vocab)]
        refs_tok = [[table[i] for i in row] for row in refs]
        hyps_tok = [[table[i] for i in row] for row in hyps]
        ours = corpus_bleu_ids(refs, hyps)
        via_tokens = corpus_bleu(refs_tok, hyps_tok)
        for k, v in via_tokens.items():
            assert abs(ours[k] - v) < 1e-12, (k, ours[k], v)
        assert nbr_common_words_ids(refs, hyps) == nbr_common_words(
            refs_tok, hyps_tok
        )
    # golden vs nltk on one of the id sets
    pytest = __import__("pytest")
    pytest.importorskip("nltk")
    golden = _nltk_quintuple(refs_tok, hyps_tok)
    for k, v in golden.items():
        assert abs(ours[k] - v) < 1e-12


def test_corpus_bleu_ids_ref_tables_identical():
    """The precomputed-ref-table path (amortizes ref-side sorts across
    subsets/eval rounds) is bit-identical to the table-free path, including
    short hypotheses, zero-match corpora, and out-of-vocab hypothesis ids."""
    from mopoe_mimic_tpu.evaluation.bleu import (
        build_ref_tables, corpus_bleu_ids, nbr_common_words_ids,
    )

    rng = np.random.default_rng(7)
    cases = []
    refs = rng.integers(0, 300, size=(24, 64))
    hyps = refs.copy()
    mask = rng.random(refs.shape) < 0.5
    # ids the references never use → unmatched hyp grams must drop cleanly
    hyps[mask] = rng.integers(300, 500, size=int(mask.sum()))
    cases.append((refs, hyps))
    cases.append((refs, rng.integers(600, 900, size=(24, 64))))  # 0 matches
    cases.append((rng.integers(0, 50, size=(4, 8)),
                  rng.integers(0, 50, size=(4, 3))))  # hyp shorter than n=4
    for refs, hyps in cases:
        tables = build_ref_tables(refs)
        plain = corpus_bleu_ids(refs, hyps)
        via_tables = corpus_bleu_ids(refs, hyps, ref_tables=tables)
        assert plain == via_tables, (plain, via_tables)
        assert nbr_common_words_ids(refs, hyps) == nbr_common_words_ids(
            refs, hyps, ref_tables=tables
        )
