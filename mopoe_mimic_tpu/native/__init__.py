from mopoe_mimic_tpu.native.fast_codec import (  # noqa: F401
    have_native,
    one_hot_encode_batch,
    gather_rows_f32,
)
