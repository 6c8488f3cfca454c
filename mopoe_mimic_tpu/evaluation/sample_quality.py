"""Generative sample quality: FID and precision/recall-for-distributions.

Parity target: mimic/evaluation/eval_metrics/sample_quality.py:12-191 +
the vendored fid/ and prd_score/ packages — per-subset InceptionV3
activations → Fréchet distance and PRD curves (k-means cluster histograms).

TPU-first deviations (documented):
  * The reference embeds samples with a ported InceptionV3 checkpoint
    (fid/inception.py:13) that is absent from the snapshot and
    undownloadable in this zero-egress environment. The embedding is
    therefore **pluggable**: any fn(images[N,H,W,C]) → [N, D]. The default
    uses the trained ClfImg trunk (train/clf_trainer.py) — domain-specific
    chest-X-ray features; an Inception embedding can be dropped in when
    its weights are available.
  * The Fréchet-distance and PRD math (cluster histograms + f_beta curve)
    are re-derived below, matching the published algorithms the vendored
    code implements; the PRD k-means runs ALL restarts as one jitted XLA
    program (k-means++ via the Gumbel trick + Lloyd as matmuls) instead of
    sklearn's per-restart host loop.
  * Samples stream device→host in memory; no PNG round-trip through disk
    (the reference writes sample dirs and re-reads them,
    save_samples.py:32-46 / sample_quality.py:12-34).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# FID
# ---------------------------------------------------------------------------

def activation_statistics(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(acts, axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _psd_sqrt(sigma: np.ndarray) -> np.ndarray:
    """Symmetric PSD square root via eigh (negative numerical-noise
    eigenvalues clipped)."""
    w, v = np.linalg.eigh(sigma)
    return (v * np.sqrt(np.clip(w, 0.0, None))) @ v.T


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6,
                     sigma1_sqrt: Optional[np.ndarray] = None) -> float:
    """FID between two Gaussians fitted to activation sets.

    tr√(Σ₁Σ₂) is computed with two symmetric eigendecompositions instead
    of ``scipy.linalg.sqrtm``: for PSD Σ₁, eig(Σ₁Σ₂) = eig(√Σ₁ Σ₂ √Σ₁)
    (a PSD matrix), so the trace term is Σ √λᵢ of that product — exact
    same value, but eigh (LAPACK *syevd) is ~an order of magnitude
    faster than sqrtm's complex Schur form, which at the 640-dim
    embedder cost ~10 s per (subset, modality) pair on a 1-core host and
    dominated the recurring eval round (and went singular → a second
    sqrtm). Negative eigenvalues from numerical noise are clipped.

    ``sigma1_sqrt`` lets callers that score many eval sets against ONE
    reference set (calc_prd_score: 8 subsets × each real modality) pay
    the √Σ₁ eigh once instead of per pair."""
    diff = mu1 - mu2
    s1_half = _psd_sqrt(sigma1) if sigma1_sqrt is None else sigma1_sqrt
    m = s1_half @ sigma2 @ s1_half
    wm = np.linalg.eigvalsh(m)
    tr_covmean = float(np.sum(np.sqrt(np.clip(wm, 0.0, None))))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean)


def calculate_fid(real_acts: np.ndarray, gen_acts: np.ndarray) -> float:
    m1, s1 = activation_statistics(real_acts)
    m2, s2 = activation_statistics(gen_acts)
    return frechet_distance(m1, s1, m2, s2)


# ---------------------------------------------------------------------------
# PRD (precision-recall for distributions; Sajjadi et al. 2018)
# ---------------------------------------------------------------------------

def compute_prd(ref_hist: np.ndarray, eval_hist: np.ndarray, num_angles: int = 1001,
                epsilon: float = 1e-10) -> Tuple[np.ndarray, np.ndarray]:
    angles = np.linspace(epsilon, np.pi / 2 - epsilon, num_angles)
    slopes = np.tan(angles)
    precision = np.minimum(ref_hist[None] * slopes[:, None], eval_hist[None]).sum(axis=1)
    recall = precision / slopes
    return np.clip(precision, 0, 1), np.clip(recall, 0, 1)


_KMEANS_RUN = None  # lazily-built persistent jit — see _kmeans_labels_batched


def _kmeans_run():
    """The batched k-means program as ONE persistent ``jax.jit`` instance.

    jit caching is per wrapper object: building a fresh ``@jax.jit`` on
    every call (the original shape of this code) re-traces and re-lowers
    the whole program each time — measured 2.3 s per call through the
    axon tunnel vs 0.03 s for a persistent instance at rehearsal scale
    ([4476, 640], 10 restarts), × ~16 (subset, modality) pairs per eval
    round. One module-level instance compiles once per (shape, k, R)
    and then every pair/round is a pure execution."""
    global _KMEANS_RUN
    if _KMEANS_RUN is not None:
        return _KMEANS_RUN
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("k", "iters"))
    def run(Xd, keys, k, iters):
        n = Xd.shape[0]
        x2 = jnp.sum(Xd * Xd, axis=1)  # [N]

        def pair_d2(centers):  # [k, D] → [N, k] squared distances
            c2 = jnp.sum(centers * centers, axis=1)
            return x2[:, None] + c2[None, :] - 2.0 * (Xd @ centers.T)

        def one(key):
            key, k0 = jax.random.split(key)
            first = jax.random.randint(k0, (), 0, n)
            c0 = Xd[first]
            centers = jnp.zeros((k, Xd.shape[1]), Xd.dtype).at[0].set(c0)
            d2 = x2 + jnp.sum(c0 * c0) - 2.0 * (Xd @ c0)

            def init_body(j, carry):
                centers, d2, key = carry
                key, kj = jax.random.split(key)
                # sample ∝ d2 (k-means++) without a host round-trip:
                # argmax(log d2 + Gumbel) == categorical(p ∝ d2)
                g = jax.random.gumbel(kj, (n,), Xd.dtype)
                idx = jnp.argmax(jnp.log(jnp.maximum(d2, 1e-12)) + g)
                c = Xd[idx]
                centers = centers.at[j].set(c)
                d2 = jnp.minimum(d2, x2 + jnp.sum(c * c) - 2.0 * (Xd @ c))
                return centers, d2, key

            centers, _, key = jax.lax.fori_loop(
                1, k, init_body, (centers, d2, key)
            )

            def lloyd(_, centers):
                lab = jnp.argmin(pair_d2(centers), axis=1)
                onehot = jax.nn.one_hot(lab, k, dtype=Xd.dtype)  # [N, k]
                counts = onehot.sum(axis=0)
                sums = onehot.T @ Xd  # [k, D]
                return jnp.where(
                    counts[:, None] > 0,
                    sums / jnp.maximum(counts, 1.0)[:, None],
                    centers,
                )

            centers = jax.lax.fori_loop(0, iters, lloyd, centers)
            return jnp.argmin(pair_d2(centers), axis=1)

        return jax.vmap(one)(keys)

    _KMEANS_RUN = run
    return run


def _kmeans_labels_batched(X, num_clusters: int, num_runs: int,
                           seed: int, iters: int = 25) -> np.ndarray:
    """[R, N] cluster labels for R independent k-means restarts, computed
    as ONE jitted XLA program (k-means++ init via the Gumbel trick, then
    Lloyd iterations; distances as a single matmul so the MXU does the
    work). Replaces sklearn's per-restart host loop — the 10-restart ×
    ~22-pair PRD pass was the dominant host cost of an eval round
    (147-195 s, RESULTS_r2_devstore; VERDICT r2 #3). ``X`` may be a host
    numpy array or an already-device-resident jax array (the fused PRD
    path keeps activations on device — no re-upload)."""
    import jax
    import jax.numpy as jnp

    keys = jax.random.split(jax.random.PRNGKey(seed), num_runs)
    labels = _kmeans_run()(jnp.asarray(X, jnp.float32), keys, num_clusters, iters)
    return np.asarray(labels)


def _concat_like(eval_data, ref_data):
    """Concatenate two activation sets without forcing a device→host or
    host→device copy: jax inputs concatenate on device (the fused PRD
    path keeps activations resident), numpy inputs stay on host."""
    if isinstance(eval_data, np.ndarray) and isinstance(ref_data, np.ndarray):
        return np.concatenate([eval_data, ref_data])
    import jax.numpy as jnp

    return jnp.concatenate([jnp.asarray(eval_data), jnp.asarray(ref_data)])


def cluster_into_bins(eval_data: np.ndarray, ref_data: np.ndarray,
                      num_clusters: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster the union, histogram each set over cluster ids."""
    both = _concat_like(eval_data, ref_data)
    # tiny sample sets (smoke evals) can't support the canonical 20 bins
    num_clusters = min(num_clusters, max(2, len(both) // 4))
    labels = _kmeans_labels_batched(both, num_clusters, num_runs=1, seed=seed)[0]
    e = np.bincount(labels[: len(eval_data)], minlength=num_clusters)
    r = np.bincount(labels[len(eval_data):], minlength=num_clusters)
    return e / e.sum(), r / r.sum()


def compute_prd_from_embedding(eval_data: np.ndarray, ref_data: np.ndarray,
                               num_clusters: int = 20, num_runs: int = 10,
                               seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Average the PRD *curves* over k-means restarts (cluster ids are
    arbitrary per run, so histograms must not be averaged across runs).
    All restarts run inside one jitted program; only the [R, N] label
    matrix comes back to the host."""
    both = _concat_like(eval_data, ref_data)
    num_clusters = min(num_clusters, max(2, len(both) // 4))
    labels = _kmeans_labels_batched(both, num_clusters, num_runs, seed)
    n_eval = len(eval_data)
    ps, rs = [], []
    for lab in labels:
        e = np.bincount(lab[:n_eval], minlength=num_clusters)
        r = np.bincount(lab[n_eval:], minlength=num_clusters)
        p, rec = compute_prd(r / r.sum(), e / e.sum())
        ps.append(p)
        rs.append(rec)
    return np.mean(ps, axis=0), np.mean(rs, axis=0)


def prd_to_max_f_beta_pair(precision: np.ndarray, recall: np.ndarray,
                           beta: float = 8.0) -> Tuple[float, float]:
    """(F_beta, F_1/beta) summary of a PRD curve."""

    def f_beta(p, r, b):
        return (1 + b ** 2) * p * r / (b ** 2 * p + r + 1e-10)

    return float(np.max(f_beta(precision, recall, beta))), float(
        np.max(f_beta(precision, recall, 1.0 / beta))
    )


def average_prd(eval_data: np.ndarray, ref_data: np.ndarray) -> float:
    """Scalar reported by the reference: mean precision over the PRD curve
    (calc_prd_score, sample_quality.py:171-191)."""
    precision, recall = compute_prd_from_embedding(eval_data, ref_data)
    return float(np.mean(precision))


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def calc_prd_score(
    exp, state, embed_fn: Callable[[np.ndarray], np.ndarray],
    max_batches: int = 0,
) -> Dict[str, float]:
    """Per-subset PRD of conditionally generated images vs real ones, plus
    random generation. embed_fn maps [N,H,W,C] images to [N,D] features."""
    import jax
    import jax.numpy as jnp

    cfg = exp.cfg
    model = exp.model
    test_loader = exp.eval_batches("test")  # device-resident when enabled
    rng = jax.random.PRNGKey((cfg.seed or 0) + 61)

    img_mods = [m for m in cfg.modality_names if m != "text"]
    # embed per batch as samples are generated — device arrays flow
    # straight into the (jitted) embedder, only the [B, D] activations
    # come home. Non-finite samples from untrained eval-mode BN
    # (docs/STABILITY.md) surface as non-finite activations; the
    # nan_to_num on activations mirrors the reference's testing-mode
    # sanitization (coherence.py:49-53). Generated images themselves are
    # sanitized BEFORE embedding: a NaN pixel becomes the embedding of a
    # zeroed image, not an all-zero activation vector.
    # Fused path: generate + embed everything in ONE jitted program per
    # batch (single dispatch / device_get — per-call RPC latency dominates
    # eval rounds over thin links, RESULTS_r3).
    # Embedder weights travel as jit ARGUMENTS (not closure constants —
    # those are serialized into the HLO and blew the axon remote-compile
    # body limit at real sizes; see clf_loader.py).
    dev_embed = getattr(embed_fn, "device_apply", None)
    embed_vars = getattr(embed_fn, "device_variables", None)

    def build_programs():
        @jax.jit
        def cond_gen(params, batch_stats, batch, r):
            def go(m, b, train):
                latents = m.inference(b, train=train)
                return m.cond_generation(latents["subsets"], train=train)

            return model.apply({"params": params, "batch_stats": batch_stats},
                               batch, train=False, rngs={"reparam": r},
                               method=go)

        @jax.jit
        def rand_gen(params, batch_stats, r):
            return model.apply({"params": params, "batch_stats": batch_stats},
                               cfg.effective_eval_batch_size, train=False,
                               rngs={"reparam": r},
                               method=lambda m, n, train: m.generate(n, train=train))

        if dev_embed is None:
            return cond_gen, rand_gen, None

        @jax.jit
        def fused(params, batch_stats, embed_vars, batch, r1, r2):
            variables = {"params": params, "batch_stats": batch_stats}

            def go(m, b, train):
                latents = m.inference(b, train=train)
                return m.cond_generation(latents["subsets"], train=train)

            cond = dict(model.apply(variables, batch, train=False,
                                    rngs={"reparam": r1}, method=go))
            cond["random"] = model.apply(
                variables, cfg.effective_eval_batch_size, train=False,
                rngs={"reparam": r2},
                method=lambda m, n, train: m.generate(n, train=train),
            )
            real = {
                m: jnp.nan_to_num(dev_embed(embed_vars, batch[m]))
                for m in img_mods
            }
            gen = {
                s: {
                    m: jnp.nan_to_num(dev_embed(embed_vars, jnp.nan_to_num(g[m])))
                    for m in img_mods
                }
                for s, g in cond.items()
            }
            return real, gen

        return cond_gen, rand_gen, fused

    # built ONCE per experiment — a per-round rebuild loses the jit cache
    # and recompiles the fused program every round (experiment.cached_jit)
    cond_gen, rand_gen, fused = exp.cached_jit(
        ("prd_programs", id(dev_embed)), build_programs
    )

    real_acts_parts = {m: [] for m in img_mods}
    gen_acts_parts: Dict[str, Dict[str, list]] = {}
    # cfg.num_samples_fid caps the FID/PRD sample count per set — the
    # reference stops saving samples at that many (coherence.py:289-291)
    n_seen = 0
    for i, (batch, _labels) in enumerate(test_loader):
        if max_batches and i >= max_batches:  # 0 → full test set
            break
        if cfg.num_samples_fid and n_seen >= cfg.num_samples_fid:
            break
        n_seen += int(batch[img_mods[0]].shape[0])
        rng, r1, r2 = jax.random.split(rng, 3)
        if fused is not None:
            # keep the per-batch activations ON DEVICE: k-means consumes
            # them resident (re-uploading [N, D] per pair cost ~2 s/pair
            # through the tunnel); only FID's moment fits pull them home,
            # once per set, below
            real, gen_all = fused(
                state.params, state.batch_stats, embed_vars, batch, r1, r2
            )
            for m in img_mods:
                real_acts_parts[m].append(real[m])
            for s_key, per_mod in gen_all.items():
                slot = gen_acts_parts.setdefault(s_key, {m: [] for m in img_mods})
                for m in img_mods:
                    slot[m].append(per_mod[m])
            continue
        cond = cond_gen(state.params, state.batch_stats, batch, r1)
        cond = dict(cond)
        cond["random"] = rand_gen(state.params, state.batch_stats, r2)
        for m in img_mods:
            real_acts_parts[m].append(np.nan_to_num(embed_fn(batch[m])))
        for s_key, gen in cond.items():
            slot = gen_acts_parts.setdefault(s_key, {m: [] for m in img_mods})
            for m in img_mods:
                slot[m].append(np.nan_to_num(embed_fn(jnp.nan_to_num(gen[m]))))

    concat = jnp.concatenate if fused is not None else np.concatenate
    results = {}
    for m in img_mods:
        real_acts = concat(real_acts_parts[m])
        # FID moment fits are host math; the real-side stats (and the
        # √Σ eigh) are shared by every subset scored against this modality
        real_host = np.asarray(jax.device_get(real_acts))
        mu_r, sig_r = activation_statistics(real_host)
        sig_r_sqrt = _psd_sqrt(sig_r)
        for s_key, parts in gen_acts_parts.items():
            gen_acts = concat(parts[m])
            results[f"prd_{m}_{s_key}"] = average_prd(gen_acts, real_acts)
            mu_g, sig_g = activation_statistics(np.asarray(jax.device_get(gen_acts)))
            results[f"fid_{m}_{s_key}"] = frechet_distance(
                mu_r, sig_r, mu_g, sig_g, sigma1_sqrt=sig_r_sqrt
            )
    return results
