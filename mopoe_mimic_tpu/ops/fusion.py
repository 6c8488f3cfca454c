"""Multimodal posterior fusion ops: PoE, MoE, and the MoPoE subset machinery.

TPU-first redesign of the reference's Python-loop fusion
(mimic/utils/BaseMMVae.py:139-196): instead of looping over the modality
powerset and concatenating tensors per subset, subset membership is a
*constant* ``[n_subsets, n_modalities]`` 0/1 mask and the per-subset
product-of-experts becomes one masked precision-sum einsum over the stacked
``[n_modalities, batch, dim]`` encoder outputs — a single fused kernel,
no data-dependent control flow.

Numerics match the reference exactly:
  * ``poe``: var = exp(logvar) + eps; T = 1/var; mu = Σ muT / ΣT; var = 1/ΣT
    (mimic/evaluation/divergence_measures/mm_div.py:10-18)
  * ``alpha_poe``: weighted precision product (mm_div.py:21-33)
  * ``mixture_component_selection``: deterministic stratified batch-axis
    partition proportional to component weights, *not* sampling
    (mimic/utils/utils.py:55-77)
  * subset enumeration: powerset in by-size order, keys = sorted names
    joined by '_' (mimic/utils/BaseExperiment.py:66-82)
"""

from __future__ import annotations

import itertools
import math
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

EPS = 1e-8


# ---------------------------------------------------------------------------
# subset enumeration (static, at model-build time)
# ---------------------------------------------------------------------------

def subset_powerset(mod_names: Sequence[str]) -> Dict[str, Tuple[int, ...]]:
    """Non-empty subsets of ``mod_names`` in the reference's dict order.

    Returns ``{subset_key: member_indices}`` where indices point into the
    original ``mod_names`` order (= the stacking order of encoder outputs)
    and ``subset_key`` joins the *sorted* member names with '_'
    (BaseExperiment.set_subsets, mimic/utils/BaseExperiment.py:66-82; the
    empty subset is dropped by every consumer).
    """
    names = list(mod_names)
    out: Dict[str, Tuple[int, ...]] = {}
    combos = itertools.chain.from_iterable(
        itertools.combinations(names, n) for n in range(1, len(names) + 1)
    )
    for combo in combos:
        key = "_".join(sorted(combo))
        out[key] = tuple(names.index(m) for m in sorted(combo))
    return out


def subset_mask_matrix(mod_names: Sequence[str]) -> np.ndarray:
    """Constant [n_subsets, n_modalities] 0/1 membership mask, rows in
    ``subset_powerset`` order."""
    subsets = subset_powerset(mod_names)
    mask = np.zeros((len(subsets), len(mod_names)), dtype=np.float32)
    for row, members in enumerate(subsets.values()):
        mask[row, list(members)] = 1.0
    return mask


# ---------------------------------------------------------------------------
# product of experts
# ---------------------------------------------------------------------------

def poe(mus: jnp.ndarray, logvars: jnp.ndarray, eps: float = EPS) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precision-weighted Gaussian product over the leading (expert) axis.

    mus, logvars: [n_experts, ...]. Matches mm_div.py:10-18.
    """
    var = jnp.exp(logvars) + eps
    t = 1.0 / var
    t_sum = jnp.sum(t, axis=0)
    pd_mu = jnp.sum(mus * t, axis=0) / t_sum
    pd_var = 1.0 / t_sum
    return pd_mu, jnp.log(pd_var)


def poe_subsets(
    mus: jnp.ndarray,
    logvars: jnp.ndarray,
    subset_mask: np.ndarray,
    prior_expert: bool = False,
    eps: float = EPS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All subset PoE products at once via the constant membership mask.

    mus, logvars: [M, B, D] stacked unimodal posteriors.
    subset_mask:  [S, M] constant 0/1 matrix.
    prior_expert: prepend a N(0, I) expert to *every* product — the
        reference does this for method='poe' (BaseMMVae.py:117-124), with
        the prior's precision being 1/(exp(0)+eps) like any other expert.

    Returns mu, logvar of shape [S, B, D]. Replaces the per-subset Python
    loop at BaseMMVae.py:148-177 with two einsums (MXU-tileable).
    """
    var = jnp.exp(logvars) + eps
    t = 1.0 / var
    mu_t = mus * t
    prior_t = 1.0 / (1.0 + eps) if prior_expert else 0.0  # exp(0) + eps
    # static unrolled masked sums: the membership mask is a compile-time
    # constant and S is tiny (≤ 7), so per-subset adds are exact f32 and
    # cheaper than routing a 0/1 contraction through the MXU (whose default
    # matmul precision costs accuracy on TPU)
    mask = np.asarray(subset_mask) > 0.5
    t_rows, mu_rows = [], []
    for row in range(mask.shape[0]):
        members = np.nonzero(mask[row])[0]
        t_sum = prior_t
        mu_t_sum = 0.0
        for m in members:
            t_sum = t_sum + t[int(m)]
            mu_t_sum = mu_t_sum + mu_t[int(m)]
        t_rows.append(t_sum)
        mu_rows.append(mu_t_sum)
    t_all = jnp.stack(t_rows)
    pd_var = 1.0 / t_all
    pd_mu = jnp.stack(mu_rows) * pd_var
    return pd_mu, jnp.log(pd_var)


def alpha_poe(alpha: jnp.ndarray, mus: jnp.ndarray, logvars: jnp.ndarray, eps: float = EPS) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted PoE with expert weights alpha [n_experts] (mm_div.py:21-33).

    Used as the dynamic prior of the JSD objective.
    """
    var = jnp.exp(logvars) + eps
    t = 1.0 / var
    alpha = alpha.reshape((-1,) + (1,) * (mus.ndim - 1)).astype(mus.dtype)
    pd_var = 1.0 / jnp.sum(alpha * t, axis=0)
    pd_mu = pd_var * jnp.sum(alpha * mus * t, axis=0)
    return pd_mu, jnp.log(pd_var)


# ---------------------------------------------------------------------------
# mixture of experts (deterministic stratified batch partition)
# ---------------------------------------------------------------------------

def _partition_bounds(batch: int, weights: Sequence[float]) -> List[Tuple[int, int]]:
    """Reference partition semantics (mimic/utils/utils.py:55-77): component
    k owns batch rows [start_k, end_k) with end_k - start_k =
    floor(batch * w_k), and the last component absorbs the remainder."""
    bounds: List[Tuple[int, int]] = []
    start = 0
    n = len(weights)
    for k, w in enumerate(weights):
        end = batch if k == n - 1 else start + int(math.floor(batch * float(w)))
        bounds.append((start, end))
        start = end
    return bounds


def mixture_component_selection(
    mus: jnp.ndarray,
    logvars: jnp.ndarray,
    weights: Sequence[float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic MoE 'sampling': concatenate each component's slice of
    the batch axis, slices proportional to ``weights``.

    mus, logvars: [K, B, D]. weights: K static floats (they are always
    uniform constants in the reference call sites, BaseMMVae.py:166-170 and
    :187-188, so the slice bounds are Python ints at trace time — the whole
    op compiles to static slices + one concat, no gather).
    """
    batch = mus.shape[1]
    bounds = _partition_bounds(batch, weights)
    # Formulated as a constant per-row component gather instead of K
    # slices + concat: row b takes component c(b) where c is a *static*
    # numpy array. Under a batch-sharded mesh every device gathers only its
    # local rows — no resharding collectives, unlike cross-shard slicing.
    comp = np.zeros((batch,), dtype=np.int32)
    for k, (s, e) in enumerate(bounds):
        comp[s:e] = k
    rows = np.arange(batch)
    mu_sel = mus[comp, rows, :]
    logvar_sel = logvars[comp, rows, :]
    return mu_sel, logvar_sel


def reweight_weights(w: np.ndarray) -> np.ndarray:
    """w / w.sum() (mimic/utils/utils.py:51-52)."""
    w = np.asarray(w, dtype=np.float64)
    return w / w.sum()
