"""mopoe_mimic_tpu — a TPU-native JAX framework for multimodal generative
learning on the MIMIC-CXR database.

A ground-up re-design of the capabilities of the PyTorch reference
Jimmy2027/MoPoE-MIMIC (multimodal mixture-of-products-of-experts VAEs over
frontal X-ray / lateral X-ray / radiology-report text), built TPU-first:

* one pure, jitted train step (no per-batch Python orchestration),
* the modality-subset powerset fusion is a static, vectorized masked-PoE
  computation (a single einsum over a constant subset-membership mask),
* likelihoods are pure log-prob functions (no distribution objects),
* data parallelism is a `jax.sharding.Mesh` + sharding annotations; XLA
  emits the gradient reductions over ICI,
* checkpoint/resume via orbax (the reference never wired resume up).

Reference layer map: see SURVEY.md at the repo root. Citations in
docstrings are `path:line` into the reference tree.
"""

__version__ = "0.1.0"

from mopoe_mimic_tpu.config import MopoeConfig, Method  # noqa: F401
