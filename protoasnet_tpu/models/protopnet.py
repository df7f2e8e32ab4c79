"""Classic ProtoPNet (PPNet) baseline model.

Parity with the reference (ProtoPNet.py:57-340): backbone features ->
add-on 1x1 convs (bottleneck w/ Sigmoid or 'regular') -> per-patch L2
distances to prototypes -> global min pool -> log/linear similarity ->
bias-free linear head (incorrect-strength -0.5 init).

Forward contract:
  __call__     -> (logits (N,K), min_distances (N,P))
  push_forward -> (conv_features (N,H',W',D), distances (N,H',W',P))
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from protoasnet_tpu.models.backbones import make_backbone
from protoasnet_tpu.models.layers import (
    BottleneckAddOn,
    AddOnLayers,
    PrototypeReadout,
    prototype_class_identity,
)
from protoasnet_tpu.ops.l2conv import l2_patch_distances

__all__ = ["PPNet"]

EPSILON = 1e-4


def _uniform01(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=0.0, maxval=1.0)


class PPNet(nn.Module):
    prototype_shape: Tuple[int, ...]  # (P, D, kh, kw)
    num_classes: int
    base_architecture: str = "resnet18"
    img_size: int = 224
    prototype_activation_function: str = "log"  # "log" | "linear"
    add_on_layers_type: str = "bottleneck"  # "bottleneck" | "regular"
    head_impl: str = "xla"  # "xla" | "pallas" (fused dist+min kernel)
    incorrect_strength: float = -0.5
    dtype: Any = jnp.float32

    @property
    def num_prototypes(self) -> int:
        return self.prototype_shape[0]

    @property
    def proto_dim(self) -> int:
        return self.prototype_shape[1]

    def class_identity(self):
        return prototype_class_identity(self.num_prototypes, self.num_classes)

    def setup(self):
        self.features = make_backbone(self.base_architecture, dtype=self.dtype)
        p, d = self.num_prototypes, self.proto_dim
        if self.add_on_layers_type == "bottleneck":
            self.add_on_layers = BottleneckAddOn(
                in_channels=self.features.out_channels, features=d, dtype=self.dtype
            )
        else:
            self.add_on_layers = AddOnLayers(features=d, final_sigmoid=True,
                                             dtype=self.dtype)
        kh, kw = self.prototype_shape[2], self.prototype_shape[3]
        self.prototype_vectors = self.param("prototype_vectors", _uniform01,
                                            (p, kh, kw, d))
        self.last_layer = PrototypeReadout(
            num_prototypes=p, num_classes=self.num_classes,
            incorrect_strength=self.incorrect_strength, dtype=self.dtype,
        )

    def conv_features(self, x, train: bool = False):
        x = self.features(x, train=train)
        return self.add_on_layers(x)

    def distance_2_similarity(self, distances):
        if self.prototype_activation_function == "log":
            return jnp.log((distances + 1.0) / (distances + EPSILON))
        if self.prototype_activation_function == "linear":
            return -distances
        raise ValueError(
            f"Unknown prototype_activation_function "
            f"{self.prototype_activation_function!r}"
        )

    def _distances(self, conv):
        if (self.head_impl == "pallas"
                and self.prototype_shape[2] == self.prototype_shape[3] == 1):
            from protoasnet_tpu.ops.pallas_l2 import l2_min_pallas

            return l2_min_pallas(conv, self.prototype_vectors)
        distances = l2_patch_distances(conv, self.prototype_vectors)
        return distances, jnp.min(distances, axis=(1, 2))

    def __call__(self, x, train: bool = False):
        conv = self.conv_features(x, train=train)  # (N, H', W', D)
        _, min_distances = self._distances(conv)  # (N, P) global min pool
        activations = self.distance_2_similarity(min_distances)
        logits = self.last_layer(activations)
        return logits, min_distances

    def push_forward(self, x, train: bool = False):
        conv = self.conv_features(x, train=train)
        distances, _ = self._distances(conv)
        return conv, distances
