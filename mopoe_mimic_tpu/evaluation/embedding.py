"""Image embedding for FID/PRD.

The reference embeds with a ported InceptionV3 (mimic/evaluation/fid/).
The architecture + weight loader live in models/inception.py and are
PREFERRED whenever ``cfg.inception_state_dict`` points at the
pt_inception .pth file (drop-in real-weight FID). In this zero-egress
environment the weights are absent, so the fallback embedder is the
trained ClfImg trunk (chest-X-ray-specific features); any
fn(images) → features can be swapped in.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np

from mopoe_mimic_tpu.train.clf_trainer import make_classifier, train_classifier
from mopoe_mimic_tpu.utils.logger import log


def make_default_embedder(exp, quick_epochs: int = 1) -> Callable[[np.ndarray], np.ndarray]:
    """The embedder is a fixed feature extractor over the DATASET (real
    images + labels), independent of the VAE state — cached on the
    experiment so repeated eval rounds reuse one embedder instead of
    retraining the ClfImg trunk every calc_prd call."""
    cached = getattr(exp, "_fid_embedder", None)
    if cached is not None:
        return cached
    cfg = exp.cfg
    # preferred: real FID InceptionV3 when its weights are available
    # (inception.py:13 parity)
    try:
        from mopoe_mimic_tpu.models.inception import load_inception_embedder

        embed = load_inception_embedder(cfg.inception_state_dict, cfg.batch_size)
        log.info(f"FID embedder: InceptionV3 ({cfg.inception_state_dict})")
        exp._fid_embedder = embed
        return embed
    except FileNotFoundError:
        log.info(
            "FID embedder: inception weights absent "
            f"({cfg.inception_state_dict}); falling back to the ClfImg trunk"
        )
    n_labels = len(exp.labels)
    img_mod = next(m for m in cfg.modality_names if m != "text")
    model = make_classifier(cfg, img_mod, n_labels)

    # disk-cached per dataset fingerprint under dir_clf, like the
    # coherence classifiers (clf_loader.py): the embedder is a fixed
    # function of the dataset, and retraining it cost ~97 s of every
    # fresh process's first PRD round at 65k scale (RESULTS_r3)
    from pathlib import Path

    import orbax.checkpoint as ocp

    from mopoe_mimic_tpu.evaluation.clf_loader import _dataset_fingerprint
    from mopoe_mimic_tpu.train.clf_trainer import ClfState

    cache_dir = (
        Path(cfg.dir_clf).expanduser() / _dataset_fingerprint(cfg)
        / f"fid_embedder_{img_mod}_{cfg.img_size}"
    )
    state = None
    if cache_dir.exists():
        try:
            restored = ocp.StandardCheckpointer().restore(
                cache_dir.absolute(), target=None
            )
            state = ClfState(
                params=restored["params"],
                batch_stats=restored.get("batch_stats", {}),
                opt_state=(), rng=jax.random.PRNGKey(0),
            )
            log.info(f"FID embedder: loaded ClfImg trunk from {cache_dir}")
        except Exception as e:
            log.warning(f"FID embedder cache load failed: {e}; retraining")
    if state is None:
        state, _ = train_classifier(
            cfg, img_mod, exp.dataset_train, exp.dataset_test, n_labels,
            max_epochs=quick_epochs,
        )
        try:
            cache_dir.parent.mkdir(parents=True, exist_ok=True)
            ocp.StandardCheckpointer().save(
                cache_dir.absolute(),
                {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)},
                force=True,
            )
        except Exception as e:
            log.warning(f"could not cache the FID embedder: {e}")

    # pin once: orbax restores host numpy, and re-uploading weights per
    # call costs per-leaf RPCs (clf_loader._make_predict)
    variables = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats}
    )

    def _apply(v, x):
        # multi-label probabilities as a low-dim embedding proxy; richer
        # penultimate features can be exposed via a trunk-only apply
        return model.apply(v, x, train=False)

    probs = jax.jit(lambda x: _apply(variables, x))

    def embed(images: np.ndarray) -> np.ndarray:
        out = []
        bs = cfg.batch_size
        for i in range(0, len(images), bs):
            chunk = images[i : i + bs]
            if len(chunk) < bs:
                pad = np.repeat(chunk[-1:], bs - len(chunk), axis=0)
                padded = np.concatenate([chunk, pad])
                out.append(np.asarray(probs(padded))[: len(chunk)])
            else:
                out.append(np.asarray(probs(chunk)))
        return np.concatenate(out)

    # pure apply + variables: inlineable into larger jitted programs with
    # the weights passed as arguments (NOT closure constants — those blow
    # the axon remote-compile body limit at real sizes; clf_loader.py)
    embed.device_apply = _apply
    embed.device_variables = variables
    exp._fid_embedder = embed
    return embed
