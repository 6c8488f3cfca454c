from mopoe_mimic_tpu.data.alphabet import ALPHABET  # noqa: F401
