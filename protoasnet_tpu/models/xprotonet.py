"""XProtoNet / Video-XProtoNet (ProtoASNet) models.

One flax module covers the image and video variants of the reference
(XProtoNet.py:8-129, Video_XProtoNet.py:8-151): in channels-last layout
the heads are rank-agnostic (Dense over channels; ROI pooling reduces all
leading spatial/temporal dims), so only the backbone differs.

Forward contract (parity with the reference):
  __call__      -> (logits (N,K), similarity01 (N,P), occurrence (N,...,P))
  push_forward  -> (roi_features (N,P,D), 1 - similarity01, occurrence, logits)
  compute_occurrence_map -> occurrence (N, ..., P)

The occurrence map here is channels-last (N, [T',] H', W', P); the
reference layout (N, P, 1, [T',] H', W') is produced only at the pickle
boundary (push/explain emit).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from protoasnet_tpu.models.backbones import make_backbone
from protoasnet_tpu.models.layers import (
    AddOnLayers,
    OccurrenceModule,
    PrototypeReadout,
    prototype_class_identity,
)
from protoasnet_tpu.ops.roi_cosine import roi_cosine_head

__all__ = ["XProtoNet"]


def _uniform01(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=0.0, maxval=1.0)


class XProtoNet(nn.Module):
    """Image (2-D backbone) or video (R(2+1)D) ProtoASNet model."""

    prototype_shape: Tuple[int, ...]  # (P, D, 1, 1[, 1]) — reference form
    num_classes: int
    base_architecture: str = "resnet18"  # or "resnet2p1d_18"
    backbone_last_layer_num: int = -3  # video backbone truncation
    img_size: int = 224
    head_impl: str = "xla"  # "xla" | "pallas"
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def num_prototypes(self) -> int:
        return self.prototype_shape[0]

    @property
    def proto_dim(self) -> int:
        return self.prototype_shape[1]

    @property
    def is_video(self) -> bool:
        return self.base_architecture in ("resnet2p1d_18", "r3d_18")

    def class_identity(self):
        return prototype_class_identity(self.num_prototypes, self.num_classes)

    def setup(self):
        self.cnn_backbone = make_backbone(
            self.base_architecture, dtype=self.dtype,
            last_layer_num=self.backbone_last_layer_num,
            remat=self.remat,
        )
        p, d = self.num_prototypes, self.proto_dim
        self.add_on_layers = AddOnLayers(features=d, dtype=self.dtype)
        self.occurrence_module = OccurrenceModule(hidden=d, num_prototypes=p,
                                                  dtype=self.dtype)
        self.prototype_vectors = self.param("prototype_vectors", _uniform01, (p, d))
        self.last_layer = PrototypeReadout(
            num_prototypes=p, num_classes=self.num_classes,
            incorrect_strength=0.0, dtype=self.dtype,
        )

    def _heads(self, x, train: bool):
        fmap = self.cnn_backbone(x, train=train)  # (N, ..., C)
        feat = self.add_on_layers(fmap)  # (N, ..., D)
        occ = jnp.abs(self.occurrence_module(fmap))  # (N, ..., P)
        roi, sim = roi_cosine_head(occ, feat, self.prototype_vectors,
                                   impl=self.head_impl)
        logits = self.last_layer(sim)
        return roi, sim, occ, logits

    def __call__(self, x, train: bool = False):
        _, sim, occ, logits = self._heads(x, train)
        return logits, sim, occ

    def compute_occurrence_map(self, x, train: bool = False):
        fmap = self.cnn_backbone(x, train=train)
        return jnp.abs(self.occurrence_module(fmap))

    def occurrence_map_softmaxed(self, fmap):
        """Softmax-normalized occurrence map over spatial/temporal
        positions per prototype (reference get_occurence_map_softmaxed,
        XProtoNet.py:75-80 — unused by the reference's training path;
        kept for API completeness). Takes backbone FEATURES like the
        reference, returns channels-last (N, ..., P)."""
        occ = self.occurrence_module(fmap)
        n, p = occ.shape[0], occ.shape[-1]
        flat = occ.reshape(n, -1, p)
        return jax.nn.softmax(flat, axis=1).reshape(occ.shape)

    def push_forward(self, x, train: bool = False):
        roi, sim, occ, logits = self._heads(x, train)
        return roi, 1.0 - sim, occ, logits
