"""Backbone zoo + factory.

Mirrors the reference ``base_architecture_to_features`` registry
(/root/reference/src/models/ProtoPNet.py:35-54): ResNet-18/34/50/101/152,
DenseNet-121/161/169/201, VGG-11/13/16/19(+bn) image trunks and the
R(2+1)D-18 video trunk.
"""

from typing import Any

import jax.numpy as jnp

from protoasnet_tpu.models.backbones.resnet2d import (  # noqa: F401
    RESNET_SPECS,
    ResNetFeatures,
    resnet_features,
)
from protoasnet_tpu.models.backbones.r2plus1d import R2Plus1D18  # noqa: F401
from protoasnet_tpu.models.backbones.densenet import (  # noqa: F401
    DENSENET_SPECS,
    DenseNetFeatures,
)
from protoasnet_tpu.models.backbones.vgg import VGG_CFGS, VGGFeatures  # noqa: F401
from protoasnet_tpu.models.backbones.r3d import R3D18  # noqa: F401

BACKBONE_NAMES = (
    tuple(RESNET_SPECS)
    + tuple(DENSENET_SPECS)
    + tuple(VGG_CFGS)
    + tuple(f"{v}_bn" for v in VGG_CFGS)
    + ("resnet2p1d_18", "r3d_18")
)


def make_backbone(name: str, dtype: Any = jnp.float32, last_layer_num: int = -3,
                  remat: bool = False):
    """Factory: architecture name -> flax trunk module (with .out_channels
    and, for 2-D trunks, .conv_info())."""
    if name == "resnet2p1d_18":
        return R2Plus1D18(last_layer_num=last_layer_num, dtype=dtype, remat=remat)
    if name == "r3d_18":
        return R3D18(last_layer_num=last_layer_num, dtype=dtype)
    if name in RESNET_SPECS:
        return ResNetFeatures(block_name=name, dtype=dtype)
    if name in DENSENET_SPECS:
        return DenseNetFeatures(variant=name, dtype=dtype)
    if name.replace("_bn", "") in VGG_CFGS:
        return VGGFeatures(variant=name, dtype=dtype)
    raise ValueError(f"Unknown base_architecture {name!r}; options: {BACKBONE_NAMES}")
