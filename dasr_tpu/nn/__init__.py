from dasr_tpu.nn.layers import PReLU, conv_block, get_norm  # noqa: F401
from dasr_tpu.nn.blocks import ResidualBlock, RDB5C, RRDB  # noqa: F401
from dasr_tpu.nn.generators import (  # noqa: F401
    DSGANGenerator,
    DeResnet,
    RRDBNet,
    SRResNet,
)
from dasr_tpu.nn.discriminators import (  # noqa: F401
    DiscriminatorBasic,
    NLayerDiscriminator,
    FSDiscriminator,
    DiscriminatorVGG,
)
