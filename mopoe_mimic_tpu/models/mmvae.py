"""The multimodal VAE core: MoPoE / PoE / MoE / JSD fusion over a static
modality-subset powerset, as one flax module whose forward pass compiles to
a single XLA program.

Capability parity with mimic/utils/BaseMMVae.py:14-231 and
mimic/networks/VAEtrimodalMimic.py:12-256, redesigned TPU-first:

  * The reference's per-subset Python loop with tensor concatenation
    (BaseMMVae.inference, :139-196) becomes a constant subset-membership
    mask + one masked-precision einsum (`ops.poe_subsets`).
  * Modality presence is **static per call** (the set of keys in the input
    batch); each presence pattern compiles once and is cached — there are
    at most 2^M - 1 = 7 patterns.
  * Method dispatch (moe/jsd/poe/joint_elbo; BaseMMVae.set_fusion_functions
    :51-69) is resolved at trace time from the frozen config.
  * Deterministic MoE mixture selection keeps the reference's stratified
    batch-partition semantics with static slice bounds.

Semantics preserved exactly:
  * subset fusion weights 1/|S| (BaseMMVae.py:166-170)
  * joint = mixture over passing subsets with uniform weights (:187-188)
  * method 'poe' prepends a N(0,I) expert to every product (:117-124)
  * method 'jsd' appends a N(0,I) component before the joint mixture
    (:178-184) and uses the alpha-PoE dynamic prior divergence (:85-99)
  * passing conditions: moe/jsd → singletons only; poe → the full set;
    joint_elbo → all subsets (:126-137)
  * image decoders emit (mean, fixed scale 0.75); the text decoder emits
    log-softmax logits (VAEtrimodalMimic.py:45-60)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mopoe_mimic_tpu.config import Method, MopoeConfig
from mopoe_mimic_tpu.models.img_networks import DecoderImg, EncoderImg
from mopoe_mimic_tpu.models.text_networks import DecoderText, EncoderText
from mopoe_mimic_tpu.ops import fusion as F
from mopoe_mimic_tpu.ops import kl as KL
from mopoe_mimic_tpu.ops.sampling import reparameterize


class MMVae(nn.Module):
    """Trimodal (or text-only) multimodal VAE."""

    config: MopoeConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else jnp.float32
        pdtype = jnp.dtype(cfg.param_dtype)
        # byte-diet knobs (config.py): BN math dtype + per-block remat.
        # "compute" resolves to the compute dtype; any other value is a
        # dtype name ("float32" = the parity default).
        bn_dtype = dtype if cfg.bn_compute_dtype == "compute" else jnp.dtype(cfg.bn_compute_dtype)
        if cfg.remat not in ("none", "blocks", "conv"):
            raise NotImplementedError(f"remat mode {cfg.remat!r}")
        remat = False if cfg.remat == "none" else cfg.remat
        style = cfg.style_dims if cfg.factorized_representation else {
            m: 0 for m in cfg.modality_names
        }
        encoders = {}
        decoders = {}
        for m in cfg.modality_names:
            if m == "text":
                encoders[m] = EncoderText(
                    dim=cfg.DIM_text,
                    class_dim=cfg.class_dim,
                    style_dim=style[m],
                    text_encoding=cfg.text_encoding,
                    vocab_size=cfg.vocab_size,
                    len_sequence=cfg.len_sequence,
                    dtype=dtype,
                    param_dtype=pdtype,
                    bn_eps=cfg.bn_eps,
                    bn_dtype=bn_dtype,
                    remat=remat,
                    fused_pointwise=cfg.fused_pointwise,
                    rng_recompute_dropout=cfg.rng_recompute_dropout,
                    name=f"encoder_{m}",
                )
                decoders[m] = DecoderText(
                    dim=cfg.DIM_text,
                    class_dim=cfg.class_dim,
                    style_dim=style[m],
                    text_encoding=cfg.text_encoding,
                    num_features=cfg.num_features,
                    len_sequence=cfg.len_sequence,
                    last_layer=(
                        "softmax" if cfg.text_encoding == "char" else cfg.text_gen_lastlayer
                    ),
                    dtype=dtype,
                    param_dtype=pdtype,
                    bn_eps=cfg.bn_eps,
                    bn_dtype=bn_dtype,
                    remat=remat,
                    fused_pointwise=cfg.fused_pointwise,
                    rng_recompute_dropout=cfg.rng_recompute_dropout,
                    name=f"decoder_{m}",
                )
            else:
                encoders[m] = EncoderImg(
                    dim=cfg.DIM_img,
                    class_dim=cfg.class_dim,
                    style_dim=style[m],
                    img_size=cfg.img_size,
                    feature_extractor=cfg.feature_extractor_img,
                    fixed_extractor=cfg.fixed_image_extractor,
                    dtype=dtype,
                    param_dtype=pdtype,
                    bn_eps=cfg.bn_eps,
                    bn_dtype=bn_dtype,
                    remat=remat,
                    fused_pointwise=cfg.fused_pointwise,
                    rng_recompute_dropout=cfg.rng_recompute_dropout,
                    name=f"encoder_{m}",
                )
                decoders[m] = DecoderImg(
                    dim=cfg.DIM_img,
                    class_dim=cfg.class_dim,
                    style_dim=style[m],
                    img_size=cfg.img_size,
                    image_channels=cfg.image_channels,
                    dtype=dtype,
                    param_dtype=pdtype,
                    bn_eps=cfg.bn_eps,
                    bn_dtype=bn_dtype,
                    remat=remat,
                    fused_pointwise=cfg.fused_pointwise,
                    rng_recompute_dropout=cfg.rng_recompute_dropout,
                    name=f"decoder_{m}",
                )
        self.encoders = encoders
        self.decoders = decoders

    # ------------------------------------------------------------------
    # encode
    # ------------------------------------------------------------------

    def encode(self, batch: Mapping[str, jnp.ndarray], train: bool = True):
        """Per-modality posteriors. Returns (content, style) dicts keyed by
        modality name; style is empty unless factorized_representation."""
        cfg = self.config
        content: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        styles: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        for m in cfg.modality_names:
            if m not in batch:
                continue
            out = self.encoders[m](batch[m], train=train)
            if cfg.factorized_representation and cfg.style_dims[m]:
                mu_c, lv_c, mu_s, lv_s = out
                styles[m] = (mu_s, lv_s)
            else:
                mu_c, lv_c = out[0], out[1]
            content[m] = (mu_c.astype(jnp.float32), lv_c.astype(jnp.float32))
        return content, styles

    # ------------------------------------------------------------------
    # inference: subset posteriors + joint
    # ------------------------------------------------------------------

    def inference(self, batch: Mapping[str, jnp.ndarray], train: bool = True) -> Dict[str, Any]:
        cfg = self.config
        method = cfg.method_enum
        present = tuple(m for m in cfg.modality_names if m in batch)
        content, styles = self.encode(batch, train=train)

        mus = jnp.stack([content[m][0] for m in present])      # [M, B, D]
        logvars = jnp.stack([content[m][1] for m in present])  # [M, B, D]
        subsets = F.subset_powerset(present)
        n_subsets = len(subsets)

        # --- per-subset fusion -------------------------------------------
        if method.uses_poe_fusion:
            mask = F.subset_mask_matrix(present)
            # Pallas kernel on TPU (≈20% faster step than the XLA masked-sum
            # formulation, bit-identical outputs); trace-time platform check
            # keeps CPU tests on the portable path.
            if cfg.use_pallas_fusion and jax.default_backend() == "tpu":
                from mopoe_mimic_tpu.ops.pallas_fusion import poe_subsets_pallas

                s_mu, s_lv = poe_subsets_pallas(
                    mus, logvars, mask, prior_expert=(method is Method.POE)
                )
            else:
                s_mu, s_lv = F.poe_subsets(
                    mus, logvars, mask, prior_expert=(method is Method.POE)
                )  # [S, B, D]
        else:  # moe / jsd: deterministic mixture within each subset
            per_subset = []
            for members in subsets.values():
                idx = np.asarray(members)
                if len(idx) == 1:
                    per_subset.append((mus[idx[0]], logvars[idx[0]]))
                else:
                    w = [1.0 / len(idx)] * len(idx)
                    per_subset.append(
                        F.mixture_component_selection(mus[idx], logvars[idx], w)
                    )
            s_mu = jnp.stack([p[0] for p in per_subset])
            s_lv = jnp.stack([p[1] for p in per_subset])

        distr_subsets = {
            key: (s_mu[i], s_lv[i]) for i, key in enumerate(subsets.keys())
        }

        # --- which subsets enter the joint mixture ------------------------
        if method in (Method.MOE, Method.JSD):
            passing = [i for i, ms in enumerate(subsets.values()) if len(ms) == 1]
        elif method is Method.POE:
            passing = [
                i for i, ms in enumerate(subsets.values()) if len(ms) == len(present)
            ]
        else:  # joint_elbo (MoPoE)
            passing = list(range(n_subsets))

        j_mus = s_mu[np.asarray(passing)]
        j_lvs = s_lv[np.asarray(passing)]

        if method is Method.JSD:
            zeros = jnp.zeros_like(j_mus[:1])
            j_mus = jnp.concatenate([j_mus, zeros], axis=0)
            j_lvs = jnp.concatenate([j_lvs, zeros], axis=0)

        k = j_mus.shape[0]
        weights = np.full((k,), 1.0 / k, dtype=np.float32)
        joint_mu, joint_lv = F.mixture_component_selection(
            j_mus, j_lvs, [1.0 / k] * k
        )

        return {
            "modalities": content,
            "styles": styles,
            "subsets": distr_subsets,
            "mus": j_mus,
            "logvars": j_lvs,
            "weights": jnp.asarray(weights),
            "joint": (joint_mu, joint_lv),
        }

    # ------------------------------------------------------------------
    # joint divergence (BaseMMVae.divergence_{static,dynamic}_prior :71-99)
    # ------------------------------------------------------------------

    def joint_divergence(self, mus, logvars, weights):
        cfg = self.config
        if cfg.method_enum.uses_dynamic_prior:
            div, klds, dyn_prior = KL.alpha_jsd_divergence(
                mus, logvars, weights, normalization=cfg.batch_size
            )
            return {"joint_divergence": div, "individual_divs": klds, "dyn_prior": dyn_prior}
        div, klds = KL.group_divergence_moe(
            mus, logvars, weights, normalization=cfg.batch_size
        )
        return {"joint_divergence": div, "individual_divs": klds, "dyn_prior": None}

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def __call__(
        self,
        batch: Mapping[str, jnp.ndarray],
        train: bool = True,
        text_prehead: bool = False,
    ) -> Dict[str, Any]:
        """``text_prehead=True`` makes the text decoder return its
        pre-vocab-head features instead of log-softmax logits, for the
        fused head+log-prob objective (cfg.fused_text_head; the train step
        wraps the features together with the head params)."""
        cfg = self.config
        latents = self.inference(batch, train=train)
        div = self.joint_divergence(
            latents["mus"], latents["logvars"], latents["weights"]
        )
        joint_mu, joint_lv = latents["joint"]
        z_class = reparameterize(self.make_rng("reparam"), joint_mu, joint_lv)

        rec: Dict[str, jnp.ndarray] = {}
        for m in cfg.modality_names:
            if m not in batch:
                continue
            z_style = None
            if cfg.factorized_representation and cfg.style_dims[m]:
                s_mu, s_lv = latents["styles"][m]
                z_style = reparameterize(self.make_rng("reparam"), s_mu, s_lv)
            if m == "text" and text_prehead:
                rec[m] = self.decoders[m](
                    z_class, z_style, train=train, prehead=True
                )
            else:
                rec[m] = self.decoders[m](z_class, z_style, train=train)

        return {
            "latents": latents,
            "group_distr": latents["joint"],
            "rec": rec,
            **div,
        }

    # ------------------------------------------------------------------
    # generation (BaseMMVae.generate/cond_generation :198-231)
    # ------------------------------------------------------------------

    def _random_styles(self, num_samples: int) -> Dict[str, Optional[jnp.ndarray]]:
        cfg = self.config
        styles: Dict[str, Optional[jnp.ndarray]] = {}
        for m in cfg.modality_names:
            if cfg.factorized_representation and cfg.style_dims[m]:
                styles[m] = jax.random.normal(
                    self.make_rng("reparam"), (num_samples, cfg.style_dims[m])
                )
            else:
                styles[m] = None
        return styles

    def generate(self, num_samples: int, train: bool = False) -> Dict[str, jnp.ndarray]:
        """Unconditional generation from the N(0, I) prior; returns the
        likelihood means per modality (generate_from_latents semantics)."""
        cfg = self.config
        z = jax.random.normal(self.make_rng("reparam"), (num_samples, cfg.class_dim))
        return self.generate_from_latents(z, self._random_styles(num_samples), train=train)

    def generate_from_latents(
        self,
        z_content: jnp.ndarray,
        styles: Optional[Mapping[str, Optional[jnp.ndarray]]] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Decode a content latent into every modality's likelihood mean.

        Image decoders emit the Laplace mean directly; the text decoder's
        OneHotCategorical mean is softmax(logits) == exp(log_softmax).
        """
        cfg = self.config
        out: Dict[str, jnp.ndarray] = {}
        for m in cfg.modality_names:
            z_style = styles.get(m) if styles else None
            y = self.decoders[m](z_content, z_style, train=train)
            out[m] = jnp.exp(y) if m == "text" else y
        return out

    def cond_generation(
        self,
        latent_distributions: Mapping[str, Tuple[jnp.ndarray, jnp.ndarray]],
        train: bool = False,
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Conditional generation from each given subset posterior."""
        out: Dict[str, Dict[str, jnp.ndarray]] = {}
        for key, (mu, lv) in latent_distributions.items():
            z = reparameterize(self.make_rng("reparam"), mu, lv)
            styles = self._random_styles(mu.shape[0])
            out[key] = self.generate_from_latents(z, styles, train=train)
        return out
