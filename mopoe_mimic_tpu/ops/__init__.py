from mopoe_mimic_tpu.ops.distributions import (  # noqa: F401
    bernoulli_log_prob,
    laplace_log_prob,
    normal_log_prob,
    one_hot_categorical_log_prob,
    get_log_prob_fn,
)
from mopoe_mimic_tpu.ops.fusion import (  # noqa: F401
    poe,
    poe_subsets,
    alpha_poe,
    mixture_component_selection,
    subset_powerset,
    subset_mask_matrix,
)
from mopoe_mimic_tpu.ops.kl import (  # noqa: F401
    kl_divergence,
    gaussian_entropy,
    group_divergence_moe,
    alpha_jsd_divergence,
)
from mopoe_mimic_tpu.ops.sampling import reparameterize  # noqa: F401
