from protoasnet_tpu.models.backbones.resnet2d import (  # noqa: F401
    ResNetFeatures,
    resnet_features,
)
from protoasnet_tpu.models.backbones.r2plus1d import R2Plus1D18  # noqa: F401
