"""MXU-native affine warps: resampling as banded matmuls, no gathers.

The generic inverse-map warp (ops/affine.py) lowers to per-pixel gathers,
which are VPU-serial on TPU (~60 ms/step for the TransformLoss warps in the
flagship train step). Here the same transforms run entirely on the MXU:

* axis-aligned resampling (zoom / crop-resize / translate) is SEPARABLE
  bilinear -> one (H_out, H_in) row-weight matmul + one (W_in, W_out)
  column-weight matmul; numerically IDENTICAL to the gather warp.
* rotation uses the Paeth three-shear decomposition
      R(th) = ShearX(-tan(th/2)) @ ShearY(sin th) @ ShearX(-tan(th/2))
  where each shear is a per-row (or per-column) 1-D linear resample,
  expressed as an (H, W_in, W_out) banded weight tensor contracted on the
  MXU. Within bilinear-interpolation error of the direct warp for the
  small angles used here (augment <=15 deg, TransformLoss <=20 deg).

Out-of-range samples get zero weight (zero fill, torchvision-affine
semantics). Weights are differentiable w.r.t. the image (linear); gradients
w.r.t. angle/scale are not needed (they are random draws).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "resample_matrix",
    "scale_about_center",
    "crop_resize_video",
    "rotate_video",
    "rotate_scale_video",
]

_HP = jax.lax.Precision.HIGHEST


def resample_matrix(n_in: int, n_out: int, src_pos: jnp.ndarray) -> jnp.ndarray:
    """(n_in, n_out) linear-interp weights: out[j] = sum_i W[i, j] * in[i]
    with src_pos[j] the (float) source coordinate of output j. Out-of-range
    positions get all-zero columns (zero fill)."""
    taps = jax.lax.broadcasted_iota(jnp.float32, (n_in, n_out), 0)
    d = jnp.abs(taps - src_pos[None, :])
    # hat weights vanish for |tap - src| >= 1 and taps only exist in
    # [0, n_in-1], so out-of-range sources get zero weight automatically —
    # including the PARTIAL weight at the half-open border, matching the
    # gather warp's zero-fill exactly.
    return jnp.clip(1.0 - d, 0.0, 1.0)


def _apply_h(video: jnp.ndarray, w_h: jnp.ndarray) -> jnp.ndarray:
    """video (..., H, W[, C]) x w_h (H_in, H_out) -> resample along H."""
    if video.ndim == 3:  # (T, H, W)
        return jnp.einsum("thw,hj->tjw", video, w_h, precision=_HP)
    return jnp.einsum("thwc,hj->tjwc", video, w_h, precision=_HP)


def _apply_w(video: jnp.ndarray, w_w: jnp.ndarray) -> jnp.ndarray:
    if video.ndim == 3:
        return jnp.einsum("thw,wj->thj", video, w_w, precision=_HP)
    return jnp.einsum("thwc,wj->thjc", video, w_w, precision=_HP)


def _shear_x(video: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Per-row horizontal shear about the center: output (i, j) samples
    input column j + k * (i - cy). Banded (H, W, W) weights on the MXU."""
    h = video.shape[-3] if video.ndim == 4 else video.shape[-2]
    w = video.shape[-2] if video.ndim == 4 else video.shape[-1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, 1, 1), 0)
    taps = jax.lax.broadcasted_iota(jnp.float32, (1, w, 1), 1)
    outs = jax.lax.broadcasted_iota(jnp.float32, (1, 1, w), 2)
    src = outs + k * (rows - cy)  # (H, 1, W) source column per (row, out)
    d = jnp.abs(taps - src)
    wt = jnp.clip(1.0 - d, 0.0, 1.0)
    if video.ndim == 3:
        return jnp.einsum("thw,hwj->thj", video, wt, precision=_HP)
    return jnp.einsum("thwc,hwj->thjc", video, wt, precision=_HP)


def _shear_y(video: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Per-column vertical shear: output (i, j) samples row i + k * (j - cx)."""
    h = video.shape[-3] if video.ndim == 4 else video.shape[-2]
    w = video.shape[-2] if video.ndim == 4 else video.shape[-1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cols = jax.lax.broadcasted_iota(jnp.float32, (w, 1, 1), 0)
    taps = jax.lax.broadcasted_iota(jnp.float32, (1, h, 1), 1)
    outs = jax.lax.broadcasted_iota(jnp.float32, (1, 1, h), 2)
    src = outs + k * (cols - cx)  # (W, 1, H): source row per (col, out-row)
    d = jnp.abs(taps - src)
    wt = jnp.clip(1.0 - d, 0.0, 1.0)
    if video.ndim == 3:
        return jnp.einsum("thw,whi->tiw", video, wt, precision=_HP)
    return jnp.einsum("thwc,whi->tiwc", video, wt, precision=_HP)


def scale_about_center(video: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Isotropic zoom about the image center (scale > 1 zooms in), same
    output size, zero fill — separable, exact vs the gather warp."""
    h = video.shape[-3] if video.ndim == 4 else video.shape[-2]
    w = video.shape[-2] if video.ndim == 4 else video.shape[-1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    inv = 1.0 / scale
    out_r = jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0)[:, 0]
    out_c = jax.lax.broadcasted_iota(jnp.float32, (w, 1), 0)[:, 0]
    src_r = inv * (out_r - cy) + cy
    src_c = inv * (out_c - cx) + cx
    video = _apply_h(video, resample_matrix(h, h, src_r))
    return _apply_w(video, resample_matrix(w, w, src_c))


def crop_resize_video(video: jnp.ndarray, top, left, crop_h, crop_w,
                      out_hw: Tuple[int, int]) -> jnp.ndarray:
    """RandomResizedCrop: separable resample of the crop box to out_hw
    (half-pixel centers; exact vs crop_resize_matrix + gather warp)."""
    h = video.shape[-3] if video.ndim == 4 else video.shape[-2]
    w = video.shape[-2] if video.ndim == 4 else video.shape[-1]
    out_h, out_w = out_hw
    j_r = jax.lax.broadcasted_iota(jnp.float32, (out_h, 1), 0)[:, 0]
    j_c = jax.lax.broadcasted_iota(jnp.float32, (out_w, 1), 0)[:, 0]
    src_r = (j_r + 0.5) * (crop_h / out_h) - 0.5 + top
    src_c = (j_c + 0.5) * (crop_w / out_w) - 0.5 + left
    video = _apply_h(video, resample_matrix(h, out_h, src_r))
    return _apply_w(video, resample_matrix(w, out_w, src_c))


def rotate_video(video: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Visual rotation by angle via Paeth three shears (|angle| < 90)."""
    theta = angle_deg * (jnp.pi / 180.0)
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    return _shear_x(_shear_y(_shear_x(video, a), b), a)


def rotate_scale_video(video: jnp.ndarray, angle_deg: jnp.ndarray,
                       scale: jnp.ndarray) -> jnp.ndarray:
    """Fast path for the TransformLoss / rotate_scale_matrix transform:
    isotropic zoom then rotation about center (they commute)."""
    return rotate_video(scale_about_center(video, scale), angle_deg)
