from mopoe_mimic_tpu.models.resblocks import (  # noqa: F401
    ResidualBlockConv,
    ResidualBlockTransposeConv,
    TorchConvTranspose,
)
from mopoe_mimic_tpu.models.img_networks import (  # noqa: F401
    EncoderImg,
    DecoderImg,
    FeatureExtractorImg,
    DataGeneratorImg,
)
from mopoe_mimic_tpu.models.text_networks import (  # noqa: F401
    EncoderText,
    DecoderText,
)
from mopoe_mimic_tpu.models.compressor import LinearFeatureCompressor  # noqa: F401
from mopoe_mimic_tpu.models.mmvae import MMVae  # noqa: F401
