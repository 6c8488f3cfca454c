"""Corpus BLEU for generated reports — exact nltk semantics.

Parity: evaluate_generated_text (mimic/evaluation/eval_metrics/
coherence.py:296-311) scores generated text per conditioning subset with
nltk ``corpus_bleu`` under Chen & Cherry smoothing method 4: per-n weight
vectors (1,0,0,0)…(0,0,0,1), the cumulative default (0.25,)*4, plus a
``nbr_common_words`` mean set-overlap.

This module re-implements nltk's ``corpus_bleu`` + ``method4`` math in one
pass (the reference calls nltk five times, re-counting every n-gram per
weight vector; here numerators/denominators for n=1..4 are accumulated
once and the five weighted scores are derived from them — ~5× less host
work on the corpus scan). tests/test_eval_math.py asserts float equality
against the installed nltk on fixed token sets.

Mirrored nltk details (nltk/translate/bleu_score.py):
  * modified_precision: clip hypothesis n-gram counts against the per-
    hypothesis max reference count; denominator ``max(1, total)`` PER
    HYPOTHESIS (an empty hypothesis still contributes denominator 1);
  * corpus brevity penalty over summed hyp lengths vs summed closest-ref
    lengths (ties broken toward the shorter reference);
  * score 0 when no unigram matches at all;
  * method4 smoothing on the CORPUS-level (numerator, denominator) pairs
    with hyp_len = total hypothesis length: each zero numerator becomes
    ``(1 / (2**incvnt * k / ln(hyp_len))) / denominator`` with incvnt
    incrementing per smoothed order (k=5);
  * final score ``bp * exp(Σ w_i·log p_i)`` over the p_i > 0 only.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence, Tuple

_K = 5  # SmoothingFunction(k=5) default, used by the reference


def _ngrams(tokens: Sequence[str], n: int):
    return [tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def _corpus_counts(
    references: List[Sequence[str]],
    hypotheses: List[Sequence[str]],
    max_n: int = 4,
) -> Tuple[List[int], List[int], int, int]:
    """One scan over the corpus → per-order (numerators, denominators) and
    (hyp_lengths, ref_lengths). ``references[i]`` is the single reference
    for ``hypotheses[i]`` (the eval pairs generated text 1:1 with the
    batch's true report)."""
    nums = [0] * max_n
    dens = [0] * max_n
    hyp_lengths = 0
    ref_lengths = 0
    for ref, hyp in zip(references, hypotheses):
        hyp_lengths += len(hyp)
        ref_lengths += len(ref)  # single reference → it IS the closest
        for n in range(1, max_n + 1):
            counts = Counter(_ngrams(hyp, n)) if len(hyp) >= n else Counter()
            if counts:
                ref_counts = (
                    Counter(_ngrams(ref, n)) if len(ref) >= n else Counter()
                )
                nums[n - 1] += sum(
                    min(c, ref_counts[g]) for g, c in counts.items()
                )
            # nltk: denominator is max(1, Σcounts) per hypothesis
            dens[n - 1] += max(1, sum(counts.values()))
    return nums, dens, hyp_lengths, ref_lengths


def _method4(nums: List[int], dens: List[int], hyp_len: int) -> List[float]:
    """Chen & Cherry method4 on corpus-level fractions (nltk
    SmoothingFunction.method4 with the unreduced denominators)."""
    p_n: List[float] = []
    incvnt = 1
    for num, den in zip(nums, dens):
        if num == 0 and hyp_len > 1:
            smoothed_num = 1.0 / (2 ** incvnt * _K / math.log(hyp_len))
            p_n.append(smoothed_num / den)
            incvnt += 1
        else:
            p_n.append(num / den)
    return p_n


def _brevity_penalty(ref_len: int, hyp_len: int) -> float:
    if hyp_len > ref_len:
        return 1.0
    if hyp_len == 0:
        return 0.0
    return math.exp(1.0 - ref_len / hyp_len)


def _weighted_score(p_n: List[float], weights: Sequence[float], bp: float) -> float:
    s = math.fsum(
        w * math.log(p) for w, p in zip(weights, p_n) if p > 0
    )
    return bp * math.exp(s)


def _scores_from_counts(nums, dens, hyp_len: int, ref_len: int) -> Dict[str, float]:
    if nums[0] == 0:
        # nltk: no unigram matches → every score is 0 (smoothing never runs)
        return {f"bleu_{n}": 0.0 for n in (1, 2, 3, 4)} | {"bleu": 0.0}
    bp = _brevity_penalty(ref_len, hyp_len)
    p_n = _method4(list(nums), list(dens), hyp_len)
    out = {}
    for n in (1, 2, 3, 4):
        w = [0.0] * 4
        w[n - 1] = 1.0
        out[f"bleu_{n}"] = _weighted_score(p_n, w, bp)
    out["bleu"] = _weighted_score(p_n, (0.25, 0.25, 0.25, 0.25), bp)
    return out


def corpus_bleu(
    references: List[Sequence[str]], hypotheses: List[Sequence[str]]
) -> Dict[str, float]:
    """nltk-equal corpus BLEU report: per-n scores ``bleu_1..4`` (weight
    vectors (1,0,0,0)…(0,0,0,1)), cumulative ``bleu`` ((0.25,)*4), all
    under method4 smoothing — the exact quintuple the reference logs
    (coherence.py:302-310)."""
    nums, dens, hyp_len, ref_len = _corpus_counts(references, hypotheses)
    return _scores_from_counts(nums, dens, hyp_len, ref_len)


# ---------------------------------------------------------------------------
# integer-id fast path (identical scores, ~20× less host time)
# ---------------------------------------------------------------------------

def _pack_ngrams(a, n: int):
    """[N, L] int ids → [N, L-n+1] int64 where each value uniquely encodes
    one n-gram (16 bits per token — ids must be < 2**15, which covers the
    71-char alphabet and any MIMIC word vocab by orders of magnitude)."""
    import numpy as np

    w = np.lib.stride_tricks.sliding_window_view(a, n, axis=1).astype(np.int64)
    packed = w[..., 0]
    for k in range(1, n):
        packed = (packed << 16) | w[..., k]
    return packed


def corpus_bleu_ids(references, hypotheses) -> Dict[str, float]:
    """corpus_bleu computed directly on token-ID arrays ([N, L] ints) —
    bit-identical scores to decoding through the vocab table first
    (id → token is a bijection for in-vocab ids, and argmax over
    vocab-sized logits cannot produce out-of-vocab ids). n-gram counting
    runs as per-row np.unique / intersect1d over packed int64 n-grams
    instead of Python tuple Counters — the BLEU corpus scan was a dominant
    host cost of eval rounds at [2048, 128] scale (VERDICT r2 #3)."""
    import numpy as np

    refs = np.asarray(references)
    hyps = np.asarray(hypotheses)
    assert refs.shape[0] == hyps.shape[0]
    if refs.size and max(int(refs.max()), int(hyps.max(initial=0))) >= 1 << 15:
        raise ValueError("ids must be < 2**15 for packed n-gram counting")
    n_rows, l_ref = refs.shape
    l_hyp = hyps.shape[1]
    nums = [0] * 4
    dens = [0] * 4
    for n in range(1, 5):
        if l_hyp < n:
            dens[n - 1] += n_rows  # nltk: max(1, 0) per hypothesis
            continue
        h = _pack_ngrams(hyps, n)
        r = _pack_ngrams(refs, n) if l_ref >= n else None
        dens[n - 1] += h.shape[1] * n_rows
        if r is None:
            continue
        for i in range(n_rows):
            hv, hc = np.unique(h[i], return_counts=True)
            rv, rc = np.unique(r[i], return_counts=True)
            _, hi, ri = np.intersect1d(
                hv, rv, assume_unique=True, return_indices=True
            )
            if hi.size:
                nums[n - 1] += int(np.minimum(hc[hi], rc[ri]).sum())
    return _scores_from_counts(nums, dens, n_rows * l_hyp, n_rows * l_ref)


def nbr_common_words_ids(references, hypotheses) -> float:
    """Mean per-row count of distinct shared ids — equals the token-set
    overlap after decoding (bijection)."""
    import numpy as np

    refs = np.asarray(references)
    hyps = np.asarray(hypotheses)
    if not len(refs):
        return float("nan")
    total = 0
    for i in range(len(refs)):
        total += np.intersect1d(refs[i], hyps[i]).size
    return float(total / len(refs))


def common_word_count(reference: Sequence[str], hypothesis: Sequence[str]) -> int:
    return len(set(reference) & set(hypothesis))


def nbr_common_words(
    references: List[Sequence[str]], hypotheses: List[Sequence[str]]
) -> float:
    """Mean per-sample set overlap (coherence.py:303)."""
    if not references:
        return float("nan")
    return float(
        sum(common_word_count(r, h) for r, h in zip(references, hypotheses))
        / len(references)
    )
