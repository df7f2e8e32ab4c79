"""DenseNet feature extractors (121/161/169/201), channels-last flax.

Capability parity with the reference DenseNet backbone zoo
(/root/reference/src/models/densenet_features.py:21-398): the classifier-
free feature trunk (conv0 stem, 4 dense blocks with transitions, final
norm+relu) plus ``conv_info()`` for the receptive-field calculator.
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Tuple

import flax.linen as nn

from protoasnet_tpu.models.norm import BatchNorm
import jax.numpy as jnp

from protoasnet_tpu.models.backbones.resnet2d import kaiming_out

__all__ = ["DenseNetFeatures", "DENSENET_SPECS"]

# name -> (init_features, growth_rate, block_config)
DENSENET_SPECS = {
    "densenet121": (64, 32, (6, 12, 24, 16)),
    "densenet161": (96, 48, (6, 12, 36, 24)),
    "densenet169": (64, 32, (6, 12, 32, 32)),
    "densenet201": (64, 32, (6, 12, 48, 32)),
}
_BN_SIZE = 4


class DenseLayer(nn.Module):
    growth_rate: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        y = nn.relu(norm(name="norm1")(x))
        y = nn.Conv(_BN_SIZE * self.growth_rate, (1, 1), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv1")(y)
        y = nn.relu(norm(name="norm2")(y))
        y = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name="norm")(x))
        x = nn.Conv(self.out_features, (1, 1), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNetFeatures(nn.Module):
    """(N, H, W, 3) -> (N, H/32, W/32, C) feature trunk."""

    variant: str = "densenet121"
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        init_f, growth, blocks = DENSENET_SPECS[self.variant]
        c = init_f
        for i, n in enumerate(blocks):
            c += n * growth
            if i != len(blocks) - 1:
                c //= 2
        return c

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_f, growth, blocks = DENSENET_SPECS[self.variant]
        norm = partial(BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = nn.Conv(init_f, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv0")(x)
        x = nn.relu(norm(name="norm0")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        c = init_f
        for i, n_layers in enumerate(blocks):
            for j in range(n_layers):
                x = DenseLayer(growth, dtype=self.dtype,
                               name=f"denseblock{i + 1}_layer{j + 1}")(x, train)
            c += n_layers * growth
            if i != len(blocks) - 1:
                c //= 2
                x = Transition(c, dtype=self.dtype,
                               name=f"transition{i + 1}")(x, train)
        x = nn.relu(norm(name="norm5")(x))
        return x

    def conv_info(self) -> Tuple[List[int], List[int], List[int]]:
        """Sequential (kernel, stride, padding) chain for the RF calculator
        (reference conv_info semantics, densenet_features.py:113-233)."""
        _, _, blocks = DENSENET_SPECS[self.variant]
        chain: List[Tuple[int, int, int]] = [(7, 2, 3), (3, 2, 1)]
        for i, n_layers in enumerate(blocks):
            for _ in range(n_layers):
                chain.extend([(1, 1, 0), (3, 1, 1)])
            if i != len(blocks) - 1:
                chain.extend([(1, 1, 0), (2, 2, 0)])
        ks, ss, ps = zip(*chain)
        return list(ks), list(ss), list(ps)
