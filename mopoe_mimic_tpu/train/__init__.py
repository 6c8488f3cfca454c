from mopoe_mimic_tpu.train.losses import (  # noqa: F401
    calc_log_probs,
    calc_klds,
    calc_klds_style,
    calc_joint_elbo_loss,
)
from mopoe_mimic_tpu.train.state import TrainState, create_train_state  # noqa: F401
from mopoe_mimic_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
