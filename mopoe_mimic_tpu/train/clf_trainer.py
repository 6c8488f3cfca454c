"""Classifier training workload — produces the checkpoints the coherence
evaluation consumes.

Parity: mimic/networks/classifiers/main_train_clf_mimic.py:49-199 and
classifiers/utils.py:102-238 — per-modality multi-label classifier, BCE or
dice loss (mimic/utils/loss.py:51-79), early stopping on *mean average
precision / dice* with best-checkpoint overwrite, results CSV. The torch
DataParallel path becomes the same jitted data-parallel step as the VAE.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.evaluation.metrics import Metrics
from mopoe_mimic_tpu.models.classifiers import ClfImg, ClfText
from mopoe_mimic_tpu.utils.logger import log


@flax.struct.dataclass
class ClfState:
    params: dict
    batch_stats: dict
    opt_state: tuple
    rng: jax.Array


def make_classifier(cfg: MopoeConfig, modality: str, n_labels: int):
    if modality == "text":
        # the classifier consumes this experiment's text tensors (and the
        # VAE's generated text), so its encoding MUST follow the data's.
        # text_clf_type is honored when it agrees; a mismatch (e.g. the
        # default word clf on a char-encoded run) would feed a word
        # embedding one-hot char tensors — warn and follow the data.
        enc = cfg.text_clf_type
        if enc not in ("char", "word") or enc != cfg.text_encoding:
            if enc in ("char", "word"):
                log.warning(
                    f"text_clf_type={enc!r} does not match "
                    f"text_encoding={cfg.text_encoding!r}; the coherence "
                    f"classifier follows the data encoding"
                )
            enc = cfg.text_encoding
        return ClfText(
            n_labels=n_labels,
            dim=cfg.DIM_text,
            text_encoding=enc,
            num_features=cfg.num_features,
            vocab_size=cfg.vocab_size,
            len_sequence=cfg.len_sequence,
        )
    if cfg.img_clf_type == "densenet":
        # CheXNet with crop-mean predictions (get_models at
        # classifiers/utils.py:214-238; crop handling CheXNet.py:85-106)
        from mopoe_mimic_tpu.models.densenet import CheXNet

        return CheXNet(n_labels=n_labels, n_crops=cfg.n_crops,
                       fixed_extractor=cfg.fixed_image_extractor)
    return ClfImg(
        n_labels=n_labels, img_size=cfg.img_size, image_channels=cfg.image_channels
    )


def make_clf_input_fn(cfg: MopoeConfig, modality: str):
    """Host-side input adapter. DenseNet image path applies the reference's
    transform chain — RGB + ImageNet normalize + Five/TenCrop(224)
    (get_transform_img, dataio/utils.py:42-69) — and flattens crops onto
    the batch axis ([B, n_crops, H, W, C] → [B·n_crops, H, W, C], the
    layout CheXNet crop-means back, main_train_clf_mimic.py:67-72)."""
    if modality == "text" or cfg.img_clf_type != "densenet":
        return lambda x: x
    from mopoe_mimic_tpu.data.transforms import get_transform_img

    tf = get_transform_img(cfg.img_size, "densenet", cfg.n_crops)

    def prep(x: np.ndarray) -> np.ndarray:
        out = np.stack([tf(np.asarray(img)) for img in x])
        if cfg.n_crops > 1:
            out = out.reshape((-1,) + out.shape[2:])
        return out

    return prep


def clf_loss_fn(kind: str):
    """BCE / dice over sigmoid probabilities (mimic/utils/loss.py:51-79)."""

    def bce(probs, targets):
        p = jnp.clip(probs, 1e-6, 1 - 1e-6)
        return -jnp.mean(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))

    def dice(probs, targets, smooth=1.0):
        inter = jnp.sum(probs * targets)
        return 1.0 - (2 * inter + smooth) / (jnp.sum(probs) + jnp.sum(targets) + smooth)

    if kind in ("binary_crossentropy", "bce_with_logits", "crossentropy"):
        return bce
    if kind == "dice":
        return dice
    raise NotImplementedError(kind)


def train_classifier(
    cfg: MopoeConfig,
    modality: str,
    dataset_train,
    dataset_eval,
    n_labels: int,
    max_epochs: int = 100,
    rng: Optional[jax.Array] = None,
    early_stop_patience: Optional[int] = None,
    write_df: bool = True,
) -> Tuple[ClfState, Dict[str, float]]:
    """Returns (best state, best eval metrics)."""
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed or 0)
    model = make_classifier(cfg, modality, n_labels)
    prep = make_clf_input_fn(cfg, modality)
    loss_fn = clf_loss_fn(cfg.clf_loss)
    tx = optax.adam(cfg.initial_learning_rate, b1=cfg.beta_1, b2=cfg.beta_2)

    # device-resident single-modality store (cfg.device_resident_data):
    # classifier training is otherwise bounded by per-step host transfer,
    # exactly like the VAE loop. The densenet crop path preps on host.
    use_store = cfg.device_resident_data and (
        modality == "text" or cfg.img_clf_type != "densenet"
    )
    store_tr = store_ev = None
    if use_store:
        from mopoe_mimic_tpu.data.device_store import DeviceStore

        store_tr = DeviceStore(dataset_train, cfg, columns=(modality,))
        store_ev = DeviceStore(dataset_eval, cfg, columns=(modality,))

    loader = BatchLoader(dataset_train, cfg.batch_size, shuffle=True, seed=cfg.seed or 0)
    eval_loader = BatchLoader(dataset_eval, cfg.batch_size, shuffle=False)
    x0, _ = next(iter(loader))
    rng, init_rng, drop_rng = jax.random.split(rng, 3)
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        {"params": init_rng, "dropout": drop_rng}, prep(x0[modality])
    )
    state = ClfState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=rng,
    )

    @jax.jit
    def train_step(state: ClfState, x, y):
        new_rng, drop = jax.random.split(state.rng)

        def lf(params):
            probs, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, rngs={"dropout": drop}, mutable=["batch_stats"],
            )
            return loss_fn(probs, y), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return (
            state.replace(
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_bs, opt_state=new_opt, rng=new_rng,
            ),
            loss,
        )

    @jax.jit
    def predict(state: ClfState, x):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x, train=False
        )

    labels = [f"l{i}" for i in range(n_labels)]
    best_metric, best_state, best_results = -math.inf, state, {}
    patience = early_stop_patience if early_stop_patience is not None else cfg.clf_early_stop_patience
    bad = 0
    steps_cap = cfg.steps_per_training_epoch if cfg.steps_per_training_epoch > 0 else None
    for epoch in range(max_epochs):
        loader.set_epoch(epoch)
        train_iter = (
            store_tr.iter_epoch(epoch, cfg.batch_size, seed=cfg.seed or 0)
            if store_tr is not None else iter(loader)
        )
        for i, (batch, y) in enumerate(train_iter):
            if steps_cap and i >= steps_cap:
                break
            x = batch[modality] if store_tr is not None else prep(batch[modality])
            state, loss = train_step(state, x, y)
        # eval: mean AP (early-stop target, classifiers/utils.py:130-203)
        preds, gts = [], []
        eval_iter = (
            store_ev.iter_epoch(0, cfg.batch_size, shuffle=False)
            if store_ev is not None else iter(eval_loader)
        )
        for batch, y in eval_iter:
            x = batch[modality] if store_ev is not None else prep(batch[modality])
            preds.append(np.asarray(predict(state, x)))
            gts.append(y)
        m = Metrics(np.concatenate(preds), np.concatenate(gts), labels)
        results = {k: v[0] for k, v in m.evaluate().items()}
        target = results.get("mean_AP_total")
        target = results["dice"] if (target is None or math.isnan(target)) else target
        log.info(f"clf[{modality}] epoch {epoch}: loss={float(loss):.4f} target={target:.4f}")
        if target > best_metric:
            best_metric, best_state, best_results = target, state, results
            bad = 0
        else:
            bad += 1
            if bad > patience:
                break
    if write_df:
        _write_clf_df(cfg, modality, epoch, best_results)
    return best_state, best_results


def _write_clf_df(cfg: MopoeConfig, modality: str, total_epochs: int,
                  best_results: Dict[str, float]) -> None:
    """Classifier results CSV twin (clf_experiments_dataframe.csv,
    mimic/networks/classifiers/utils.py:47-89): one row per classifier
    training run — full config + best eval metrics + epochs trained."""
    try:
        import os
        import time

        from mopoe_mimic_tpu.utils.experiment_df import ExperimentDataframe

        os.makedirs(cfg.dir_clf, exist_ok=True)
        run = f"clf_{modality}_{time.strftime('%Y_%m_%d_%H_%M_%S')}"
        df = ExperimentDataframe(
            f"{cfg.dir_clf}/clf_experiments_dataframe.csv", cfg, run
        )
        df.update({
            "modality": modality,
            "total_epochs": total_epochs,
            **{f"best_{k}": v for k, v in best_results.items()},
        })
    except Exception as e:
        log.warning(f"clf results CSV not written: {e}")


def main(argv=None) -> None:
    """Standalone classifier-training CLI (parity:
    networks/classifiers/main_train_clf_mimic.py:97-132): trains — or
    loads, when cached — the CheXpert-label classifier for every modality
    of the configured experiment and stores the checkpoints under
    ``dir_clf``, where the coherence eval (and any later run with the same
    dataset fingerprint) picks them up.

        python -m mopoe_mimic_tpu.train.clf_trainer --config_path cfg.json \
            --img_clf_type densenet --clf_loss dice
    """
    from mopoe_mimic_tpu.config import MopoeConfig
    from mopoe_mimic_tpu.evaluation.clf_loader import load_or_train_classifiers
    from mopoe_mimic_tpu.experiment import Experiment

    cfg = MopoeConfig.from_cli(argv)
    load_or_train_classifiers(Experiment(cfg))


if __name__ == "__main__":
    main()
