"""BLEU for generated reports (parity: evaluate_generated_text,
mimic/evaluation/eval_metrics/coherence.py:296-311 — corpus BLEU-1..4 of
generated text against the reference reports, plus a common-word count)."""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence


def _ngrams(tokens: Sequence[str], n: int):
    return [tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def corpus_bleu(
    references: List[List[str]], hypotheses: List[List[str]], max_n: int = 4
) -> Dict[str, float]:
    """Corpus-level BLEU-1..4 with the standard brevity penalty (pure
    python — no nltk dependency in the hot path)."""
    import math

    out = {}
    for n in range(1, max_n + 1):
        clipped, total = 0, 0
        ref_len, hyp_len = 0, 0
        for ref, hyp in zip(references, hypotheses):
            ref_len += len(ref)
            hyp_len += len(hyp)
            ref_counts = Counter(_ngrams(ref, n))
            hyp_counts = Counter(_ngrams(hyp, n))
            total += max(sum(hyp_counts.values()), 0)
            clipped += sum(min(c, ref_counts[g]) for g, c in hyp_counts.items())
        if total == 0:
            out[f"bleu_{n}"] = 0.0
            continue
        precision = clipped / total
        bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
        out[f"bleu_{n}"] = bp * precision
    return out


def common_word_count(reference: Sequence[str], hypothesis: Sequence[str]) -> int:
    return len(set(reference) & set(hypothesis))
