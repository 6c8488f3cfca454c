"""Generation-coherence evaluation (parity:
mimic/evaluation/eval_metrics/coherence.py:36-324).

* Random generation: decode prior samples in every modality, classify each
  with its pretrained CheXpert-label classifier; a sample is *coherent*
  for a label when all modalities' argmaxed predictions agree
  (calculate_coherence, :87-112).
* Conditional generation: for every subset posterior, generate all
  modalities and score classifier predictions against the true labels with
  average precision per (label, subset, modality) (:204-293).
* Generated-text quality: BLEU-1..4 vs the reference report (:296-311).

Classifiers come from the clf_trainer workload (train/clf_trainer.py) —
the analog of the reference's pretrained checkpoint directory.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.evaluation.bleu import corpus_bleu
from mopoe_mimic_tpu.evaluation.metrics import eval_label_ap
from mopoe_mimic_tpu.utils.logger import log


def transform_gen_samples(cfg: MopoeConfig, modality: str, x) -> np.ndarray:
    """Adapt generated samples to the classifier's input contract
    (transform_gen_samples, coherence.py:115-125): word-encoded text is
    generated as per-position vocab probabilities but the word classifier
    consumes token ids → argmax. Device arrays stay on device (the
    classifier predict fns are jitted) — only probabilities come home."""
    if modality == "text" and cfg.text_encoding == "word" and x.ndim == 3:
        xp = jnp if isinstance(x, jax.Array) else np
        return xp.argmax(x, axis=-1).astype(xp.int32)
    return x


class CoherenceEvaluator:
    """Holds the per-modality classifiers (predict fns closed over their
    trained params)."""

    def __init__(self, cfg: MopoeConfig, clf_predict: Mapping[str, Callable]):
        """clf_predict: {modality: fn(batch_mod) -> [B, n_labels] probs}."""
        self.cfg = cfg
        self.clf_predict = dict(clf_predict)

    def _predict(self, modality: str, x: np.ndarray) -> np.ndarray:
        return np.asarray(
            self.clf_predict[modality](transform_gen_samples(self.cfg, modality, x))
        )

    # -- random generation coherence -----------------------------------
    def calculate_coherence(self, samples: Mapping[str, np.ndarray], labels_names) -> Dict[str, float]:
        cfg = self.cfg
        preds = []
        for m in cfg.modality_names:
            probs = self._predict(m, samples[m])
            preds.append(np.argmax(np.nan_to_num(probs), axis=1))
        preds = np.stack(preds)  # [M, B]
        coherent = np.all(preds == preds[0:1], axis=0)
        rate = float(coherent.sum()) / preds.shape[1]
        return {l: rate for l in labels_names}

    # -- conditional generation ------------------------------------------
    def classify_cond_gen(
        self, cond_samples: Mapping[str, Mapping[str, np.ndarray]],
        labels: np.ndarray, labels_names,
    ) -> Dict[str, Dict[str, Dict[str, float]]]:
        """{label: {subset: {modality: AP}}}."""
        out: Dict[str, Dict[str, Dict[str, float]]] = {
            l: {s: {} for s in cond_samples} for l in labels_names
        }
        for s_key, gen in cond_samples.items():
            for m in self.cfg.modality_names:
                probs = np.nan_to_num(self._predict(m, gen[m]))
                for li, l_key in enumerate(labels_names):
                    out[l_key][s_key][m] = eval_label_ap(probs, labels, li)
        return out


def test_generation(exp, state, evaluator: CoherenceEvaluator, max_batches: int = 0) -> Dict[str, Any]:
    """Full coherence pass over the test set (test_generation,
    coherence.py:226-293)."""
    cfg = exp.cfg
    model = exp.model
    test_loader = exp.eval_batches("test")  # device-resident when enabled
    rng = jax.random.PRNGKey((cfg.seed or 0) + 47)

    @jax.jit
    def gen_random(params, batch_stats, r):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, cfg.batch_size,
            train=False, rngs={"reparam": r},
            method=lambda m, n, train: m.generate(n, train=train),
        )

    @jax.jit
    def cond_gen(params, batch_stats, batch, r):
        def go(m, b, train):
            latents = m.inference(b, train=train)
            return m.cond_generation(latents["subsets"], train=train)

        return model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            train=False, rngs={"reparam": r}, method=go,
        )

    rand_coherences = []
    cond_results = []
    gen_text_ids: Dict[str, list] = {}
    ref_text_ids = []
    for i, (batch, labels) in enumerate(test_loader):
        if max_batches and i >= max_batches:
            break
        rng, r1, r2 = jax.random.split(rng, 3)
        # generated samples are classified ON DEVICE (the predict fns are
        # jitted); only the [B, n_labels] probabilities are downloaded —
        # never the 7×3 generated modality tensors themselves
        rand = gen_random(state.params, state.batch_stats, r1)
        rand_coherences.append(
            evaluator.calculate_coherence(rand, exp.labels)
        )
        cond = cond_gen(state.params, state.batch_stats, batch, r2)
        cond_results.append(
            evaluator.classify_cond_gen(cond, np.nan_to_num(labels), exp.labels)
        )
        # text quality PER conditioning subset (evaluate_generated_text is
        # per subset, coherence.py:296-311); argmax on device so only the
        # [B, L] int id arrays come home, not [B, L, vocab] probabilities
        for s_key, gen in cond.items():
            gen_text_ids.setdefault(s_key, []).append(
                np.asarray(jnp.argmax(gen["text"], axis=-1), dtype=np.int32)
            )
        ref = batch["text"]
        if ref.ndim == 3:  # char one-hot → ids
            ref = jnp.argmax(ref, axis=-1)
        ref_text_ids.append(np.asarray(ref, dtype=np.int32))

    # average over batches
    def avg_nested(dicts):
        if not dicts:
            return {}
        out = {}
        first = dicts[0]
        for k, v in first.items():
            if isinstance(v, dict):
                out[k] = avg_nested([d[k] for d in dicts])
            else:
                vals = [d[k] for d in dicts]
                vals = [x for x in vals if x == x]  # drop NaNs
                out[k] = float(np.mean(vals)) if vals else float("nan")
        return out

    results = {
        "random_coherence": avg_nested(rand_coherences),
        "cond_coherence": avg_nested(cond_results),
    }
    if ref_text_ids:
        text_eval = _text_bleu_per_subset(
            cfg, exp, gen_text_ids, np.concatenate(ref_text_ids)
        )
        if text_eval:
            results["text_gen"] = text_eval
    return results


def _text_bleu_per_subset(
    cfg: MopoeConfig, exp, gen_ids: Mapping[str, list], ref_ids: np.ndarray
) -> Dict[str, Dict[str, float]]:
    """{subset: {bleu_1..4, bleu, nbr_common_words}} — the reference's
    evaluate_generated_text quintuple + common-word overlap per subset
    (coherence.py:296-311). Inputs are pre-argmaxed id arrays; the
    reference text is decoded ONCE and shared across subsets."""
    from mopoe_mimic_tpu.data.text_codec import tensor_to_tokens
    from mopoe_mimic_tpu.evaluation.bleu import nbr_common_words

    try:
        refs = tensor_to_tokens(cfg, exp, ref_ids, probs=False)
    except Exception as e:  # vocab may be absent on synthetic data
        log.debug(f"text decode for BLEU skipped: {e}")
        return {}
    out: Dict[str, Dict[str, float]] = {}
    for s_key, parts in gen_ids.items():
        hyp = tensor_to_tokens(cfg, exp, np.concatenate(parts), probs=False)
        scores = corpus_bleu(refs, hyp)
        scores["nbr_common_words"] = nbr_common_words(refs, hyp)
        out[s_key] = scores
    return out
