"""Plain 3-D ResNet-18 (r3d_18) video trunk, channels-last flax.

Capability parity with the reference's (unused but shipped) ResNet3D18
wrapper (/root/reference/src/models/resnet_features.py:330-345): torchvision
r3d_18 layout — (3,7,7) stem, BasicBlocks of full 3x3x3 convs — truncatable
like the R(2+1)D trunk.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn

from protoasnet_tpu.models.norm import BatchNorm
import jax.numpy as jnp

from protoasnet_tpu.models.backbones.resnet2d import kaiming_out

__all__ = ["R3D18"]


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.planes, (3, 3, 3), strides=(self.stride,) * 3,
                    padding=1, use_bias=False, kernel_init=kaiming_out,
                    dtype=self.dtype, name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv2")(y)
        y = norm(name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1, 1),
                               strides=(self.stride,) * 3, use_bias=False,
                               kernel_init=kaiming_out, dtype=self.dtype,
                               name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class R3D18(nn.Module):
    """(N, T, H, W, 3) -> (N, T', H', W', C); truncation like R2Plus1D18."""

    last_layer_num: int = -3
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        kept = (7 + self.last_layer_num if self.last_layer_num < 0
                else self.last_layer_num)
        return {2: 64, 3: 128, 4: 256, 5: 512}[kept]

    @nn.compact
    def __call__(self, x, train: bool = False):
        kept = (7 + self.last_layer_num if self.last_layer_num < 0
                else self.last_layer_num)
        n_stages = kept - 1
        if not 1 <= n_stages <= 4:
            raise ValueError(f"last_layer_num={self.last_layer_num} invalid")
        x = nn.Conv(64, (3, 7, 7), strides=(1, 2, 2),
                    padding=((1, 1), (3, 3), (3, 3)), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="stem_conv")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        for i in range(n_stages):
            planes = 64 * (2**i)
            for j in range(2):
                stride = 2 if (i > 0 and j == 0) else 1
                x = BasicBlock3D(planes, stride, dtype=self.dtype,
                                 name=f"layer{i + 1}_{j}")(x, train=train)
        return x
