"""VGG feature extractors (11/13/16/19, with/without BN), channels-last.

Capability parity with the reference VGG backbone zoo
(/root/reference/src/models/vgg_features.py:20-336): the classifier-free
conv trunk plus ``conv_info()`` for the receptive-field calculator.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn

from protoasnet_tpu.models.norm import BatchNorm
import jax.numpy as jnp

from protoasnet_tpu.models.backbones.resnet2d import kaiming_out

__all__ = ["VGGFeatures", "VGG_CFGS"]

VGG_CFGS = {
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512,
              512, 512, "M", 512, 512, 512, 512, "M"],
}


class VGGFeatures(nn.Module):
    variant: str = "vgg16"  # "vggNN" or "vggNN_bn"
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return 512

    def _cfg(self):
        return VGG_CFGS[self.variant.replace("_bn", "")]

    @property
    def batch_norm(self) -> bool:
        return self.variant.endswith("_bn")

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv_idx = 0
        for v in self._cfg():
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(int(v), (3, 3), padding=1,
                            kernel_init=kaiming_out,
                            bias_init=nn.initializers.zeros,
                            use_bias=not self.batch_norm,
                            dtype=self.dtype, name=f"conv{conv_idx}")(x)
                if self.batch_norm:
                    x = BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype, name=f"bn{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
        return x

    def conv_info(self) -> Tuple[List[int], List[int], List[int]]:
        chain: List[Tuple[int, int, int]] = []
        for v in self._cfg():
            if v == "M":
                chain.append((2, 2, 0))
            else:
                chain.append((3, 1, 1))
        ks, ss, ps = zip(*chain)
        return list(ks), list(ss), list(ps)
