"""R(2+1)D-18 video backbone, channels-last flax.

Re-implements the torchvision ``r2plus1d_18`` trunk used by the reference
(/root/reference/src/models/resnet_features.py:307-327): a (2+1)D stem and
four BasicBlock stages where every 3-D conv factorizes into a spatial
(1,3,3) conv + BN + ReLU + temporal (3,1,1) conv with the standard
mid-plane count  mid = (in*out*27) // (in*9 + 3*out).

``last_layer_num`` truncates the stage list exactly like the reference's
``nn.Sequential(children[:last_layer_num])``:
  -3 -> stem + layer1..3, output (N, T/4, H/8, W/8, 256)
  -2 -> stem + layer1..4, output (N, T/8, H/16, W/16, 512)

Input: (N, T, H, W, 3) normalized clips. TPU notes: all convs are NDHWC
XLA convolutions (MXU-tiled); BN stats live in ``batch_stats``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn

from protoasnet_tpu.models.norm import BatchNorm
import jax.numpy as jnp
from jax import lax

from protoasnet_tpu.models.backbones.resnet2d import kaiming_out

__all__ = ["R2Plus1D18", "midplanes"]


def midplanes(inplanes: int, planes: int) -> int:
    return (inplanes * planes * 3 * 3 * 3) // (inplanes * 3 * 3 + 3 * planes)


class SpaceToDepthStemConv(nn.Module):
    """The stem's (1,7,7)/stride-(1,2,2) conv rewritten — exactly — as a
    (1,4,4)/stride-1 conv over 2x2 space-to-depth input.

    The 3-channel 7x7 stride-2 conv profiles at ~5 TFLOP/s / 41 GB/s on
    v5e (3 input channels starve the MXU's contraction dim); folding each
    2x2 pixel block into channels gives a 12-channel 4x4 dense conv that
    computes the identical dot products (measured: fwd+bwd 10.6 -> 6.9 ms
    at the flagship's stem shape, bitwise-equal output up to bf16 rounding).

    The parameter is the ORIGINAL (1, 7, 7, C, features) kernel under the
    same {kernel} name nn.Conv would create, so torchvision weight import
    (torch_import.py) and checkpoints are unchanged; the s2d kernel is a
    pad+reshape VIEW built at trace time (zero-cost, fused by XLA).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", kaiming_out, (1, 7, 7, c, self.features),
                            jnp.float32)
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        b, t, h, w, _ = x.shape
        if h % 2 or w % 2:  # fall back to the plain conv for odd sizes
            return lax.conv_general_dilated(
                x, kernel, (1, 2, 2), [(0, 0), (3, 3), (3, 3)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        # out[h'] = sum_i k[i] x[2h'+i-3]; with low pad 4 the padded row
        # index is 2h' + (i+1): block (i+1)//2, phase (i+1)%2 — a 4-tap
        # dense conv over (phase-major, channel-minor) s2d channels. High
        # pad 2 makes the VALID conv output exactly H/2 (no output slice —
        # a post-conv slice costs a full-copy of the activation).
        xp = jnp.pad(x, ((0, 0), (0, 0), (4, 2), (4, 2), (0, 0)))
        hh, ww = xp.shape[2] // 2, xp.shape[3] // 2
        x4 = (xp.reshape(b, t, hh, 2, ww, 2, c)
              .transpose(0, 1, 2, 4, 3, 5, 6)
              .reshape(b, t, hh, ww, 4 * c))
        kp = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
        k2 = (kp.reshape(1, 4, 2, 4, 2, c, self.features)
              .transpose(0, 1, 3, 2, 4, 5, 6)
              .reshape(1, 4, 4, 4 * c, self.features))
        return lax.conv_general_dilated(
            x4, k2, (1, 1, 1), [(0, 0), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


class Conv2Plus1D(nn.Module):
    """Factorized 3-D conv: spatial (1,3,3) then temporal (3,1,1).

    Perf note: evaluating the spatial conv as a 2-D conv over
    (N*T, H, W, C) looks ~25% faster in isolation (fwd+bwd 101 vs 78
    TF/s, experiments/conv_layouts.py) but regresses the FULL network
    2.7x (512 -> 186 clips/s inference) — the (N,T)<->(N*T) reshapes
    around every spatial conv force layout conversions against the
    neighboring 3-D temporal convs. Keep everything NDHWC 3-D.
    """

    inplanes: int
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = midplanes(self.inplanes, self.planes)
        x = nn.Conv(mid, (1, 3, 3), strides=(1, self.stride, self.stride),
                    padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="spatial")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn_mid")(x)
        x = nn.relu(x)
        x = nn.Conv(self.planes, (3, 1, 1), strides=(self.stride, 1, 1),
                    padding=((1, 1), (0, 0), (0, 0)), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="temporal")(x)
        return x


class BasicBlock2Plus1D(nn.Module):
    inplanes: int
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = Conv2Plus1D(self.inplanes, self.planes, self.stride,
                        dtype=self.dtype, name="conv1")(x, train=train)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = Conv2Plus1D(self.planes, self.planes, 1,
                        dtype=self.dtype, name="conv2")(y, train=train)
        y = norm(name="bn2")(y)
        if self.stride != 1 or self.inplanes != self.planes:
            residual = nn.Conv(self.planes, (1, 1, 1),
                               strides=(self.stride,) * 3, use_bias=False,
                               kernel_init=kaiming_out, dtype=self.dtype,
                               name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class R2Plus1D18(nn.Module):
    """Truncatable R(2+1)D-18 trunk. (N, T, H, W, 3) -> (N, T', H', W', C)."""

    last_layer_num: int = -3  # -3 keeps layer1..3 (256ch); -2 keeps layer4 (512ch)
    dtype: Any = jnp.float32
    remat: bool = False  # jax.checkpoint each block: activations traded for FLOPs
    s2d_stem: bool = True  # exact space-to-depth stem conv (see SpaceToDepthStemConv)

    @property
    def out_channels(self) -> int:
        n_stages = self._num_stages()
        return {1: 64, 2: 128, 3: 256, 4: 512}[n_stages]

    def _num_stages(self) -> int:
        # children = [stem, layer1, layer2, layer3, layer4, avgpool, fc]
        # children[:last_layer_num] keeps (5 + last_layer_num) modules
        kept = 7 + self.last_layer_num if self.last_layer_num < 0 else self.last_layer_num
        n_stages = kept - 1
        if not 1 <= n_stages <= 4:
            raise ValueError(f"last_layer_num={self.last_layer_num} keeps no conv stages")
        return n_stages

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        # (2+1)D stem: 45 mid-channels (torchvision R2Plus1dStem)
        if self.s2d_stem:
            x = SpaceToDepthStemConv(45, dtype=self.dtype,
                                     name="stem_spatial")(x)
        else:
            x = nn.Conv(45, (1, 7, 7), strides=(1, 2, 2),
                        padding=((0, 0), (3, 3), (3, 3)), use_bias=False,
                        kernel_init=kaiming_out, dtype=self.dtype,
                        name="stem_spatial")(x)
        x = norm(name="stem_bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 1, 1), strides=(1, 1, 1),
                    padding=((1, 1), (0, 0), (0, 0)), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="stem_temporal")(x)
        x = norm(name="stem_bn2")(x)
        x = nn.relu(x)

        n_stages = self._num_stages()
        block_cls = (nn.remat(BasicBlock2Plus1D, static_argnums=(2,))
                     if self.remat else BasicBlock2Plus1D)
        inplanes = 64
        for i in range(n_stages):
            planes = 64 * (2**i)
            for j in range(2):
                stride = 2 if (i > 0 and j == 0) else 1
                x = block_cls(inplanes, planes, stride, dtype=self.dtype,
                              name=f"layer{i + 1}_{j}")(x, train)
                inplanes = planes
        return x
