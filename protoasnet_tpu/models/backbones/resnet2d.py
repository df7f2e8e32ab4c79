"""2-D ResNet feature extractors (18/34/50/101/152), channels-last flax.

Capability parity with the reference backbone zoo
(/root/reference/src/models/resnet_features.py:126-305): the avgpool/fc-free
feature trunk, plus ``conv_info()`` — the per-layer (kernel, stride,
padding) chain consumed by the receptive-field calculator
(receptive_field.py parity; see protoasnet_tpu/push/receptive_field.py).

TPU notes: NHWC layout (XLA's native conv layout), BatchNorm with
running-average stats in a ``batch_stats`` collection, compute in float32
with optional bfloat16 activations via ``dtype``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Tuple

import flax.linen as nn

from protoasnet_tpu.models.norm import BatchNorm
import jax.numpy as jnp

__all__ = ["ResNetFeatures", "resnet_features", "RESNET_SPECS"]

# kaiming normal, fan_out, relu — matching torch init (ProtoPNet.py:313-324)
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=kaiming_out,
                    dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape[-1] != self.filters or self.stride != 1:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=kaiming_out,
                               dtype=self.dtype, name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)

    @staticmethod
    def conv_info(in_filters: int, filters: int, stride: int):
        # main path only, as in the reference (resnet_features.py:31-73):
        # the RF chain tracks the sequential conv path
        return [(3, stride, 1), (3, 1, 1)]


class Bottleneck(nn.Module):
    filters: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        out_filters = self.filters * self.expansion
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=kaiming_out,
                    dtype=self.dtype)(y)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(out_filters, (1, 1), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape[-1] != out_filters or self.stride != 1:
            residual = nn.Conv(out_filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=kaiming_out,
                               dtype=self.dtype, name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)

    @staticmethod
    def conv_info(in_filters: int, filters: int, stride: int):
        return [(1, 1, 0), (3, stride, 1), (1, 1, 0)]


RESNET_SPECS = {
    "resnet18": (BasicBlock, [2, 2, 2, 2]),
    "resnet34": (BasicBlock, [3, 4, 6, 3]),
    "resnet50": (Bottleneck, [3, 4, 6, 3]),
    "resnet101": (Bottleneck, [3, 4, 23, 3]),
    "resnet152": (Bottleneck, [3, 8, 36, 3]),
}


class ResNetFeatures(nn.Module):
    """avgpool/fc-free ResNet trunk: (N, H, W, 3) -> (N, H/32, W/32, C)."""

    block_name: str = "resnet18"
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        block, sizes = RESNET_SPECS[self.block_name]
        return 512 if block is BasicBlock else 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_sizes = RESNET_SPECS[self.block_name]
        norm = partial(
            BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(stage_sizes):
            filters = 64 * (2**i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = block_cls(filters=filters, stride=stride, dtype=self.dtype,
                              name=f"layer{i + 1}_{j}")(x, train=train)
        return x

    def conv_info(self) -> Tuple[List[int], List[int], List[int]]:
        """(kernel_sizes, strides, paddings) of the sequential conv chain,
        for the receptive-field calculator (reference conv_info semantics,
        resnet_features.py:215-234)."""
        block_cls, stage_sizes = RESNET_SPECS[self.block_name]
        chain: List[Tuple[int, int, int]] = [(7, 2, 3), (3, 2, 1)]  # conv1 + maxpool
        in_f = 64
        for i, n_blocks in enumerate(stage_sizes):
            filters = 64 * (2**i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                chain.extend(block_cls.conv_info(in_f, filters, stride))
                in_f = filters * (4 if block_cls is Bottleneck else 1)
        ks, ss, ps = zip(*chain)
        return list(ks), list(ss), list(ps)


def resnet_features(name: str, dtype: Any = jnp.float32) -> ResNetFeatures:
    if name not in RESNET_SPECS:
        raise ValueError(f"Unknown resnet variant {name!r}; options: {list(RESNET_SPECS)}")
    return ResNetFeatures(block_name=name, dtype=dtype)
