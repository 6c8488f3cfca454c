"""Latent-representation evaluation: linear classifiers on subset-posterior
means (parity: mimic/evaluation/eval_metrics/representation.py:20-187).

The reference fits one sklearn LogisticRegression(lbfgs) per
(label × subset) on CPU. TPU-first redesign: all |subsets| × |labels|
binary logistic regressions train **simultaneously** as one jitted,
vmapped full-batch Adam loop — a single [S·L, D] weight matrix, so the
whole eval is a couple of matmuls per iteration instead of 21 sklearn
fits; sklearn remains only in the AP metric.

Flow parity:
  * train: encode ≥ num_training_samples_lr training samples → subset
    means (inference), resample until every label has both classes
    (representation.py:73-87) → fit.
  * test: encode test set → predict probabilities → Metrics per subset
    (representation.py:91-145).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.evaluation.metrics import Metrics
from mopoe_mimic_tpu.utils.logger import log


# ---------------------------------------------------------------------------
# latent extraction
# ---------------------------------------------------------------------------

def collect_subset_means(exp, state, loader, max_samples: int, mesh=None):
    """Run jitted inference over the loader; returns
    ({subset_key: [N, D] means}, labels [N, L])."""
    model = exp.model

    def build_infer():
        @jax.jit
        def infer(params, batch_stats, batch):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                train=False,
                method=lambda m, b, train: m.inference(b, train=train),
            )
            return {k: mu for k, (mu, lv) in out["subsets"].items()}

        return infer

    # one build per experiment: a per-call jit would recompile every eval
    # round (experiment.cached_jit)
    infer = exp.cached_jit("repr_infer", build_infer)

    collected: Dict[str, list] = {}
    labels_all = []
    n = 0
    for batch, labels in loader:
        means = jax.device_get(infer(state.params, state.batch_stats, batch))
        for k, v in means.items():
            collected.setdefault(k, []).append(v)
        labels_all.append(labels)
        n += len(labels)
        if n >= max_samples:
            break
    data = {k: np.concatenate(v) for k, v in collected.items()}
    labels = np.concatenate(labels_all)
    if jax.process_count() > 1:
        # multi-controller: each rank encoded its host shard — assemble
        # the full set on every rank so the LR fit/eval is global and
        # rank-identical (parallel/mesh.allgather_rows contract)
        from mopoe_mimic_tpu.parallel.mesh import allgather_rows

        data = {k: allgather_rows(v) for k, v in data.items()}
        labels = allgather_rows(labels)
    return {k: v[:max_samples] for k, v in data.items()}, labels[:max_samples]


def resample_both_classes(
    data: Mapping[str, np.ndarray], labels: np.ndarray, n_samples: int,
    rng: np.random.Generator, max_tries: int = 1000,
):
    """Random subsample that contains both classes for every label
    (get_random_labels, representation.py:73-87)."""
    assert any(len(np.unique(labels[:, l])) > 1 for l in range(labels.shape[1])), (
        "labels must contain at least two classes"
    )
    n = labels.shape[0]
    for _ in range(max_tries):
        idx = rng.integers(0, n, size=n_samples)
        sub = labels[idx]
        if all(len(np.unique(sub[:, l])) > 1 for l in range(labels.shape[1])):
            return {k: v[idx] for k, v in data.items()}, sub
    raise AssertionError("could not sample both classes; increase batch size")


# ---------------------------------------------------------------------------
# vmapped logistic regression
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("iters",))
def _fit_lr_batch(x: jnp.ndarray, y: jnp.ndarray, iters: int = 500, lr: float = 0.1):
    """Fit K independent binary LRs: x [K, N, D], y [K, N] → (w [K, D], b [K]).

    Full-batch Adam with L2(1.0) matching sklearn's default C=1 ridge.
    """
    k, n, d = x.shape
    # standardize per-problem for conditioning (affine-invariant predictions)
    mean = jnp.mean(x, axis=1, keepdims=True)
    std = jnp.std(x, axis=1, keepdims=True) + 1e-6
    xs = (x - mean) / std

    def loss_fn(params):
        w, b = params
        logits = jnp.einsum("knd,kd->kn", xs, w) + b[:, None]
        ll = jnp.mean(
            jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits))),
            axis=1,
        )
        reg = 0.5 / n * jnp.sum(w * w, axis=1)
        return jnp.sum(ll + reg)

    import optax

    params = (jnp.zeros((k, d)), jnp.zeros((k,)))
    tx = optax.adam(0.1)
    opt_state = tx.init(params)

    def body(_, carry):
        params, opt_state = carry
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    params, _ = jax.lax.fori_loop(0, iters, body, (params, opt_state))
    w, b = params
    # fold standardization back into (w, b)
    w_orig = w / std[:, 0, :]
    b_orig = b - jnp.sum(w_orig * mean[:, 0, :], axis=1)
    return w_orig, b_orig


class LatentClassifier:
    """All (subset × label) logistic regressions in one weight matrix."""

    def __init__(self, subset_keys, label_names, w: np.ndarray, b: np.ndarray):
        self.subset_keys = list(subset_keys)
        self.label_names = list(label_names)
        self.w = w  # [S*L, D]
        self.b = b

    def predict_proba(self, data: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """{subset: [N, L] probabilities}."""
        out = {}
        n_l = len(self.label_names)
        for si, s_key in enumerate(self.subset_keys):
            x = np.asarray(data[s_key])
            w = self.w[si * n_l : (si + 1) * n_l]  # [L, D]
            b = self.b[si * n_l : (si + 1) * n_l]
            logits = x @ w.T + b
            out[s_key] = 1.0 / (1.0 + np.exp(-logits))
        return out


def train_clf_lr_all_subsets(exp, state, mesh=None) -> LatentClassifier:
    cfg = exp.cfg
    train_loader = exp.eval_batches("train")  # device-resident when enabled
    data, labels = collect_subset_means(
        exp, state, train_loader, max_samples=max(cfg.num_training_samples_lr * 2,
                                                  cfg.effective_eval_batch_size),
        mesh=mesh
    )
    rng = np.random.default_rng(cfg.seed or 0)
    labels = np.nan_to_num(labels)
    data, labels = resample_both_classes(
        data, labels, cfg.num_training_samples_lr, rng
    )
    subset_keys = list(data.keys())
    n_l = labels.shape[1]
    # stack problems: [S*L, N, D]
    x = np.stack(
        [np.nan_to_num(data[s]) for s in subset_keys for _ in range(n_l)]
    )
    y = np.stack([labels[:, l] for _ in subset_keys for l in range(n_l)])
    w, b = _fit_lr_batch(jnp.asarray(x), jnp.asarray(y))
    return LatentClassifier(subset_keys, exp.labels, np.asarray(w), np.asarray(b))


def test_clf_lr_all_subsets(exp, state, clf: LatentClassifier, mesh=None) -> Dict[str, Dict[str, float]]:
    """Evaluate the latent LR classifiers (reference representation.py:91).

    Library function, not a pytest test — the name keeps reference parity.
    """
    cfg = exp.cfg
    test_loader = exp.eval_batches("test")
    data, labels = collect_subset_means(
        exp, state, test_loader, max_samples=len(exp.dataset_test), mesh=mesh
    )
    labels = np.nan_to_num(labels)
    probs = clf.predict_proba({k: np.nan_to_num(v) for k, v in data.items()})
    results = {}
    for s_key, p in probs.items():
        m = Metrics(p, labels, exp.labels)
        results[s_key] = {k: v[0] for k, v in m.evaluate().items()}
    return results


# keep pytest from collecting the reference-parity-named library function
test_clf_lr_all_subsets.__test__ = False
