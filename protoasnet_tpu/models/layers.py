"""Shared model layers: add-on feature module, occurrence module, readout.

In channels-last layout every 1x1(x1) conv in the reference
(XProtoNet.py:21-41, Video_XProtoNet.py:27-62, ProtoPNet.py:89-130) is a
Dense over the channel axis — one implementation covers both the 2-D and
3-D models and XLA fuses the chain into the surrounding matmuls.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.models.backbones.resnet2d import kaiming_out

__all__ = [
    "prototype_class_identity",
    "incorrect_connection_kernel",
    "AddOnLayers",
    "BottleneckAddOn",
    "OccurrenceModule",
    "PrototypeReadout",
]


def prototype_class_identity(num_prototypes: int, num_classes: int) -> np.ndarray:
    """(P, K) one-hot class-identity matrix, equal prototypes per class
    (reference get_prototype_class_identity, ProtoPNet.py:326-340)."""
    if num_prototypes % num_classes != 0:
        raise ValueError(
            f"num_prototypes ({num_prototypes}) must be divisible by "
            f"num_classes ({num_classes})"
        )
    per_class = num_prototypes // num_classes
    ident = np.zeros((num_prototypes, num_classes), dtype=np.float32)
    ident[np.arange(num_prototypes), np.arange(num_prototypes) // per_class] = 1.0
    return ident


def incorrect_connection_kernel(num_prototypes: int, num_classes: int,
                                incorrect_strength: float) -> np.ndarray:
    """(P, K) last-layer kernel: 1 on own-class entries, incorrect_strength
    elsewhere (set_last_layer_incorrect_connection, ProtoPNet.py:299-311)."""
    ident = prototype_class_identity(num_prototypes, num_classes)
    return ident + incorrect_strength * (1.0 - ident)


class AddOnLayers(nn.Module):
    """XProtoNet feature-extractor module: Dense(C->D) ReLU Dense(D->D)
    [+ optional Sigmoid for the classic ProtoPNet 'regular' variant]."""

    features: int
    final_sigmoid: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, kernel_init=kaiming_out,
                     bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.features, kernel_init=kaiming_out,
                     bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
        if self.final_sigmoid:
            x = nn.sigmoid(x)
        return x


def bottleneck_channel_plan(in_channels: int, out_channels: int) -> Sequence[Tuple[int, int]]:
    """Channel plan of the reference 'bottleneck' add-on (ProtoPNet.py:89-115):
    halve channels per step until reaching out_channels."""
    plan = []
    cur = in_channels
    while cur > out_channels or not plan:
        nxt = max(out_channels, cur // 2)
        plan.append((cur, nxt))
        cur = cur // 2
    return plan


class BottleneckAddOn(nn.Module):
    """Classic ProtoPNet bottleneck add-on; ends with Sigmoid unless
    ``drop_final_activation`` (the XProtoNet image variant drops it,
    XProtoNet.py:17)."""

    in_channels: int
    features: int
    drop_final_activation: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        plan = bottleneck_channel_plan(self.in_channels, self.features)
        for i, (_, out) in enumerate(plan):
            x = nn.Dense(out, kernel_init=kaiming_out,
                         bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dense(out, kernel_init=kaiming_out,
                         bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
            last = i == len(plan) - 1
            if not last:
                x = nn.relu(x)
            elif not self.drop_final_activation:
                x = nn.sigmoid(x)
        return x


class OccurrenceModule(nn.Module):
    """Occurrence-map module: Dense(C->D) ReLU Dense(D->D/2) ReLU
    Dense(D/2->P, no bias). Caller applies |.| (absolute-value variant)."""

    hidden: int  # D = prototype channel dim
    num_prototypes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=kaiming_out,
                     bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden // 2, kernel_init=kaiming_out,
                     bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_prototypes, use_bias=False,
                     kernel_init=kaiming_out, dtype=self.dtype)(x)
        return x


class PrototypeReadout(nn.Module):
    """Bias-free similarity->logits layer with incorrect-connection init."""

    num_prototypes: int
    num_classes: int
    incorrect_strength: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sim):
        def init(key, shape, dtype=jnp.float32):
            del key
            if self.num_prototypes % self.num_classes != 0:
                # pruned models have uneven per-class counts; init values are
                # irrelevant there (params come from a checkpoint)
                return jnp.zeros(shape, dtype)
            return jnp.asarray(
                incorrect_connection_kernel(
                    self.num_prototypes, self.num_classes, self.incorrect_strength
                ),
                dtype=dtype,
            )

        return nn.Dense(self.num_classes, use_bias=False, kernel_init=init,
                        dtype=self.dtype)(sim)
