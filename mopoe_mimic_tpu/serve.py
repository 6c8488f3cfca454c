"""Production inference: load a trained run and serve jitted encode /
generate / conditional-generation with batch-size bucketing.

No reference counterpart — the reference stops at offline eval
(mimic/main_mimic.py trains; there is no deployment entry point). This is
the serving surface of the framework:

  * a run directory (``config.json`` + orbax ``checkpoints/``, as written
    by Experiment) fully describes a deployable model;
  * every request path is one jitted XLA program per (function, bucket) —
    requests are padded up to the nearest static bucket size, so
    steady-state traffic never recompiles and shapes stay MXU-friendly;
  * weights restore from the BEST checkpoint by test loss when metrics
    were recorded (utils/checkpoints.CheckpointManager), else the latest.

Ahead-of-time deployment: ``InferenceSession.export`` serializes the
endpoints as self-contained StableHLO artifacts (``jax.export``, weights
baked in, cross-lowered for CPU+TPU); ``load_exported`` runs them with
no model code, checkpoint layout, or config — the JAX-native equivalent
of a SavedModel.

CLI:
    python -m mopoe_mimic_tpu.serve --run_dir DIR --mode generate \
        --num_samples 16 --out OUT_DIR
    python -m mopoe_mimic_tpu.serve --run_dir DIR --mode export --bucket 32
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.models.mmvae import MMVae
from mopoe_mimic_tpu.train.state import create_train_state
from mopoe_mimic_tpu.utils.logger import log

DEFAULT_BUCKETS = (1, 8, 32, 128)


def _pad_rows(arr: np.ndarray, n: int) -> np.ndarray:
    if len(arr) == n:
        return arr
    pad = np.repeat(arr[-1:], n - len(arr), axis=0)
    return np.concatenate([arr, pad], axis=0)


class InferenceSession:
    """Checkpoint → jitted inference endpoints.

    Parameters
    ----------
    run_dir: an Experiment run directory (reads ``config.json`` and
        ``checkpoints/``). Alternatively pass ``cfg`` plus
        ``checkpoint_dir`` (or a live ``state`` for in-process use).
    epoch: restore a specific epoch; default = best by test loss,
        falling back to latest.
    buckets: allowed static batch sizes; requests pad up to the nearest.
    """

    def __init__(
        self,
        run_dir: Optional[str] = None,
        cfg: Optional[MopoeConfig] = None,
        checkpoint_dir: Optional[str] = None,
        state=None,
        epoch: Optional[int] = None,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
    ):
        if cfg is None:
            if run_dir is None:
                raise ValueError("need run_dir or cfg")
            with open(os.path.join(run_dir, "config.json")) as f:
                raw = json.load(f)
            known = {f.name for f in MopoeConfig.__dataclass_fields__.values()}  # type: ignore[attr-defined]
            cfg = MopoeConfig(**{k: v for k, v in raw.items() if k in known})
        self.cfg = cfg
        self.model = MMVae(cfg)
        self.buckets = tuple(sorted(buckets))
        self._jitted: Dict[Tuple[str, int], Any] = {}

        if state is None:
            if checkpoint_dir is None:
                if run_dir is None:
                    raise ValueError("need checkpoint_dir, run_dir, or state")
                checkpoint_dir = os.path.join(run_dir, "checkpoints")
            from mopoe_mimic_tpu.data.loader import BatchLoader
            from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
            from mopoe_mimic_tpu.utils.checkpoints import CheckpointManager

            tiny = cfg.replace(batch_size=max(self.buckets[0], 2))
            template_batch, _ = next(iter(BatchLoader(
                SyntheticMimic(tiny, seed=0), tiny.batch_size, shuffle=False)))
            template = create_train_state(
                cfg, jax.random.PRNGKey(0), template_batch, model=self.model)
            mgr = CheckpointManager(checkpoint_dir)
            restore_epoch = epoch
            if restore_epoch is None:
                restore_epoch = mgr.best_epoch()
                if restore_epoch is None:
                    restore_epoch = mgr.latest_epoch()
            self.epoch, state = mgr.restore(template, epoch=restore_epoch)
            mgr.close()
            log.info(f"serving epoch {self.epoch} from {checkpoint_dir}")
        else:
            self.epoch = -1
        # pin the weights ON DEVICE once: orbax restore returns host numpy,
        # and host arrays as jit arguments re-upload per call — measured
        # ~2 s/call of pure weight upload on the flagship (the same trap
        # the eval suite hit; see ROADMAP round-3 "device-pinned weights").
        # device_put is a no-op for arrays already on device (live-state
        # sessions).
        self.params = jax.device_put(state.params)
        self.batch_stats = jax.device_put(state.batch_stats)

    # ------------------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _chunks(self, n: int):
        """Split a request of n rows into bucket-sized chunks."""
        done = 0
        while done < n:
            take = min(n - done, self.buckets[-1])
            yield done, take, self._bucket(take)
            done += take

    def _fn(self, kind: str, n: int, compact: bool = False):
        """``compact=True`` applies the wire diet to generated outputs ON
        DEVICE: text probs → argmax token ids (download shrinks by the
        vocab size — word 3517×, char 71×) and float images → uint8
        (4×, lossless for PNG writers). Through a thin link the result
        download dominates endpoint latency (benchmarks/bench_serve.py:
        batch-64 generate moves ~140 MB full vs ~6 MB compact)."""
        key = (kind, n, compact)
        if key not in self._jitted:
            model = self.model

            def _diet(out):
                if not compact:
                    return out
                out = dict(out)
                for m, v in out.items():
                    if m == "text":
                        out[m] = jnp.argmax(v, axis=-1).astype(jnp.int32)
                    else:
                        out[m] = jnp.clip(
                            v.astype(jnp.float32) * 255.0 + 0.5, 0, 255
                        ).astype(jnp.uint8)
                return out

            if kind == "generate":
                # seed travels as a scalar and becomes a key INSIDE the
                # jitted program — a host-side PRNGKey/split is itself a
                # device dispatch (multi-RTT) through the tunnel
                def go(params, stats, seed, chunk):
                    r = jax.random.fold_in(jax.random.PRNGKey(seed), chunk)
                    return _diet(model.apply(
                        {"params": params, "batch_stats": stats}, n,
                        train=False, rngs={"reparam": r},
                        method=lambda m, k, train: m.generate(k, train=train),
                    ))
            elif kind == "encode":
                def go(params, stats, batch):
                    def m_enc(m, b, train):
                        lat = m.inference(b, train=train)
                        return {"subsets": lat["subsets"], "joint": lat["joint"]}

                    return model.apply(
                        {"params": params, "batch_stats": stats}, batch,
                        train=False, rngs={"reparam": jax.random.PRNGKey(0)},
                        method=m_enc,
                    )
            elif kind == "cond_generate":
                def go(params, stats, batch, seed, chunk):
                    r = jax.random.fold_in(jax.random.PRNGKey(seed), chunk)

                    def m_cond(m, b, train):
                        lat = m.inference(b, train=train)
                        return m.cond_generation(lat["subsets"], train=train)

                    out = model.apply(
                        {"params": params, "batch_stats": stats}, batch,
                        train=False, rngs={"reparam": r}, method=m_cond,
                    )
                    return {s: _diet(mods) for s, mods in out.items()}
            else:
                raise ValueError(kind)
            self._jitted[key] = jax.jit(go)
        return self._jitted[key]

    # ------------------------------------------------------------------
    # endpoints
    # ------------------------------------------------------------------

    def generate(
        self, num_samples: int, seed: int = 0, compact: bool = False
    ) -> Dict[str, np.ndarray]:
        """Unconditional samples from the prior: modality → array.

        ``compact=True`` returns text as int32 token ids and images as
        uint8 (both converted on device) — the production wire format;
        ``decode_text`` accepts either form."""
        outs = []
        for chunk_i, (_start, take, bucket) in enumerate(self._chunks(num_samples)):
            full = jax.device_get(self._fn("generate", bucket, compact)(
                self.params, self.batch_stats, seed, chunk_i))
            outs.append({m: v[:take] for m, v in full.items()})
        return {m: np.concatenate([o[m] for o in outs]) for m in outs[0]}

    def encode(self, batch: Mapping[str, np.ndarray]) -> Dict[str, Any]:
        """Posterior parameters: {'subsets': {key: (mu, logvar)},
        'joint': (mu, logvar)} for every modality subset."""
        n = len(next(iter(batch.values())))
        merged: Optional[Dict[str, Any]] = None
        for start, take, bucket in self._chunks(n):
            padded = {k: _pad_rows(np.asarray(v)[start:start + take], bucket)
                      for k, v in batch.items()}
            out = jax.device_get(self._fn("encode", bucket)(
                self.params, self.batch_stats, padded))
            out = jax.tree_util.tree_map(lambda a: a[:take], out)
            merged = out if merged is None else jax.tree_util.tree_map(
                lambda a, b: np.concatenate([a, b]), merged, out)
        return merged

    def cond_generate(
        self, batch: Mapping[str, np.ndarray], seed: int = 0,
        compact: bool = False,
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """Conditional generation from every subset posterior of the given
        (full-modality) batch: subset_key → modality → array.
        ``compact`` as in :meth:`generate`."""
        n = len(next(iter(batch.values())))
        merged: Optional[Dict[str, Any]] = None
        for chunk_i, (start, take, bucket) in enumerate(self._chunks(n)):
            padded = {k: _pad_rows(np.asarray(v)[start:start + take], bucket)
                      for k, v in batch.items()}
            out = jax.device_get(self._fn("cond_generate", bucket, compact)(
                self.params, self.batch_stats, padded, seed, chunk_i))
            out = jax.tree_util.tree_map(lambda a: a[:take], out)
            merged = out if merged is None else jax.tree_util.tree_map(
                lambda a, b: np.concatenate([a, b]), merged, out)
        return merged


    # ------------------------------------------------------------------
    # ahead-of-time export (jax.export / StableHLO)
    # ------------------------------------------------------------------

    def export(
        self,
        out_dir: str,
        kinds: Sequence[str] = ("generate", "encode", "cond_generate"),
        bucket: Optional[int] = None,
        platforms: Sequence[str] = ("cpu", "tpu"),
    ) -> Dict[str, str]:
        """Serialize the inference endpoints as self-contained StableHLO
        artifacts (``jax.export``): weights are baked in as constants, so
        a consumer needs only jax — no model code, no checkpoint layout,
        no config — to run them (``load_exported``). Cross-lowered for all
        ``platforms`` so one artifact serves CPU canaries and TPU fleets.

        One artifact per (endpoint, static batch ``bucket``); returns
        {kind: artifact path} and writes a ``manifest.json`` with the
        config snapshot, shapes, and jax version."""
        from jax import export as jexport

        bucket = bucket or self.buckets[0]
        os.makedirs(out_dir, exist_ok=True)
        cfg = self.cfg
        key_spec = jax.ShapeDtypeStruct((2,), np.uint32)
        batch_spec = {
            "PA": jax.ShapeDtypeStruct(
                (bucket, cfg.img_size, cfg.img_size, cfg.image_channels),
                np.float32),
            "Lateral": jax.ShapeDtypeStruct(
                (bucket, cfg.img_size, cfg.img_size, cfg.image_channels),
                np.float32),
            "text": (
                jax.ShapeDtypeStruct((bucket, cfg.len_sequence), np.int32)
                if cfg.text_encoding == "word"
                else jax.ShapeDtypeStruct(
                    (bucket, cfg.len_sequence, cfg.num_features), np.float32)
            ),
        }
        model, params, stats = self.model, self.params, self.batch_stats
        paths: Dict[str, str] = {}
        for kind in kinds:
            if kind == "generate":
                def fn(r):
                    return model.apply(
                        {"params": params, "batch_stats": stats}, bucket,
                        train=False, rngs={"reparam": r},
                        method=lambda m, k, train: m.generate(k, train=train))
                args = (key_spec,)
            elif kind == "encode":
                def fn(batch):
                    def m_enc(m, b, train):
                        lat = m.inference(b, train=train)
                        return {"subsets": lat["subsets"], "joint": lat["joint"]}
                    return model.apply(
                        {"params": params, "batch_stats": stats}, batch,
                        train=False, rngs={"reparam": jax.random.PRNGKey(0)},
                        method=m_enc)
                args = (batch_spec,)
            elif kind == "cond_generate":
                def fn(batch, r):
                    def m_cond(m, b, train):
                        lat = m.inference(b, train=train)
                        return m.cond_generation(lat["subsets"], train=train)
                    return model.apply(
                        {"params": params, "batch_stats": stats}, batch,
                        train=False, rngs={"reparam": r}, method=m_cond)
                args = (batch_spec, key_spec)
            else:
                raise ValueError(kind)
            exported = jexport.export(
                jax.jit(fn), platforms=tuple(platforms))(*args)
            path = os.path.join(out_dir, f"{kind}_b{bucket}.jaxexport")
            with open(path, "wb") as f:
                f.write(exported.serialize())
            paths[kind] = path
            log.info(f"exported {kind} (bucket {bucket}) → {path}")
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump({
                "bucket": bucket,
                "platforms": list(platforms),
                "kinds": {k: os.path.basename(v) for k, v in paths.items()},
                "epoch": self.epoch,
                "jax_version": jax.__version__,
                "config": {
                    "img_size": cfg.img_size, "len_sequence": cfg.len_sequence,
                    "text_encoding": cfg.text_encoding,
                    "class_dim": cfg.class_dim, "method": cfg.method,
                },
            }, f, indent=2)
        return paths

    # ------------------------------------------------------------------
    # raw-input helpers (production ergonomics; the codecs the training
    # pipeline uses, exposed on the session)
    # ------------------------------------------------------------------

    def text_array(self, reports: Sequence[str]) -> np.ndarray:
        """Raw report strings → the model's text input array (word ids via
        the persisted vocabulary under cfg.dir_data, or char one-hots)."""
        cfg = self.cfg
        if cfg.text_encoding == "word":
            from mopoe_mimic_tpu.data.vocab import Vocab

            base = os.path.join(
                os.path.expanduser(cfg.dir_data), f"files_small_{cfg.img_size}"
            )
            vocab = Vocab.load(base, cfg.word_min_occ, cfg.len_sequence)
            if vocab is None:
                raise FileNotFoundError(
                    f"no persisted vocabulary under {base}; serve word-mode "
                    "models next to their training data"
                )
            return np.stack([
                vocab.encode(str(t), cfg.len_sequence) for t in reports
            ]).astype(np.int32)
        from mopoe_mimic_tpu.data.text_codec import one_hot_encode

        return np.stack([
            one_hot_encode(cfg.len_sequence, str(t).lower()) for t in reports
        ])

    def decode_text(self, probs: np.ndarray, i2w=None) -> list:
        """Generated text probabilities OR compact int token ids →
        strings (char) / token lists (word; needs the vocab's i2w unless
        provided)."""
        from mopoe_mimic_tpu.data.text_codec import tensor_to_text

        cfg = self.cfg
        probs = np.asarray(probs)
        one_hot = not np.issubdtype(probs.dtype, np.integer)
        if cfg.text_encoding == "char":
            rows = tensor_to_text(probs, one_hot=one_hot)
            return ["".join(r) for r in rows]
        if i2w is None:
            from mopoe_mimic_tpu.data.vocab import Vocab

            base = os.path.join(
                os.path.expanduser(cfg.dir_data), f"files_small_{cfg.img_size}"
            )
            vocab = Vocab.load(base, cfg.word_min_occ, cfg.len_sequence)
            if vocab is None:
                raise FileNotFoundError("word-mode decode needs the vocab (i2w)")
            i2w = vocab.i2w
        return tensor_to_text(probs, one_hot=one_hot, i2w=i2w)


def load_exported(artifact_dir: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load artifacts written by ``InferenceSession.export``.

    Returns ({kind: callable}, manifest). The callables are the
    deserialized StableHLO programs with the trained weights baked in —
    running them needs only jax, not the model code, the checkpoint
    layout, or the training config."""
    from jax import export as jexport

    with open(os.path.join(artifact_dir, "manifest.json")) as f:
        manifest = json.load(f)
    fns: Dict[str, Any] = {}
    for kind, fname in manifest["kinds"].items():
        with open(os.path.join(artifact_dir, fname), "rb") as f:
            fns[kind] = jexport.deserialize(bytearray(f.read())).call
    return fns, manifest


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main(argv: Optional[Sequence[str]] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--mode", choices=("generate", "export"), default="generate")
    ap.add_argument("--num_samples", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--bucket", type=int, default=None,
                    help="static batch size for --mode export")
    ap.add_argument("--compact", action="store_true",
                    help="production wire format: on-device text argmax "
                    "(saved as text_ids.npy) + uint8 images — shrinks the "
                    "device download ~20x on the flagship")
    ap.add_argument("--out", default=None, help="output dir (default: run_dir/serving)")
    args = ap.parse_args(argv)

    sess = InferenceSession(run_dir=args.run_dir, epoch=args.epoch)
    out_dir = args.out or os.path.join(args.run_dir, "serving")
    os.makedirs(out_dir, exist_ok=True)
    if args.mode == "export":
        paths = sess.export(out_dir, bucket=args.bucket)
        log.info(f"exported {sorted(paths)} to {out_dir}")
        return
    samples = sess.generate(args.num_samples, seed=args.seed, compact=args.compact)
    from mopoe_mimic_tpu.utils.save_samples import write_samples_img_to_file

    for m, data in samples.items():
        if m == "text":
            name = "text_ids.npy" if args.compact else "text_probs.npy"
            np.save(os.path.join(out_dir, name), data)
        else:
            write_samples_img_to_file(data, os.path.join(out_dir, f"{m}.png"))
    log.info(f"wrote {args.num_samples} samples to {out_dir}")


if __name__ == "__main__":
    main()
