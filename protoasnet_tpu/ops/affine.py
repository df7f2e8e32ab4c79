"""Batched 2-D affine warps as pure XLA ops.

Replaces the reference's torchvision ``affine`` calls (loss.py:257-313 for
the TransformLoss equivariance regularizer) and its
RandomResizedCrop+RandomRotate augmentation (as_dataloader.py:127-132) with
a single fused bilinear warp: rotation, isotropic scale, crop-resize and
translation compose into one 2x3 matrix, so every augmented clip is
resampled exactly once.

Convention: coordinates are (row, col) pixel indices; transforms are
specified in *output* space and inverted to sample the input (standard
inverse warping). Rotation is counter-clockwise for positive angles on the
(row, col) grid with the row axis pointing down — matching torchvision's
visual convention. Out-of-bounds samples fill with 0.

All functions are jit/vmap/grad-safe (static output shapes, no python
branching on traced values).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "rotate_scale_matrix",
    "crop_resize_matrix",
    "compose",
    "affine_warp",
    "affine_warp_video",
]


def rotate_scale_matrix(angle_deg: jnp.ndarray, scale: jnp.ndarray,
                        height: int, width: int) -> jnp.ndarray:
    """Inverse-map matrix for rotate-by-angle + zoom-by-scale about center.

    Returns a (2, 3) matrix M such that  p_in = M @ [r_out, c_out, 1].
    ``scale`` > 1 zooms in (objects appear larger), matching torchvision
    ``affine(..., scale=s)`` semantics.
    """
    theta = -angle_deg * (jnp.pi / 180.0)  # inverse rotation
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    inv_s = 1.0 / scale
    cy, cx = (height - 1) / 2.0, (width - 1) / 2.0
    # rows are (r_in, c_in) = R(-theta)/s @ (r-cy, c-cx) + (cy, cx)
    # On the (row, col) grid a visual CCW rotation of the image content by
    # +angle corresponds to rotating sample coordinates by -angle.
    a, b = inv_s * cos, inv_s * sin
    m = jnp.array(
        [
            [a, -b, 0.0],
            [b, a, 0.0],
        ]
    )
    t = jnp.array([cy, cx]) - m[:, :2] @ jnp.array([cy, cx])
    return jnp.concatenate([m[:, :2], t[:, None]], axis=1)


def crop_resize_matrix(top: jnp.ndarray, left: jnp.ndarray,
                       crop_h: jnp.ndarray, crop_w: jnp.ndarray,
                       out_h: int, out_w: int) -> jnp.ndarray:
    """Inverse-map matrix: output (out_h, out_w) samples the crop box
    [top:top+crop_h, left:left+crop_w] of the input (RandomResizedCrop)."""
    sy = crop_h / out_h
    sx = crop_w / out_w
    # half-pixel centers: in = (out + 0.5) * scale - 0.5 + origin
    return jnp.array(
        [
            [sy, 0.0, top + 0.5 * sy - 0.5],
            [0.0, sx, left + 0.5 * sx - 0.5],
        ]
    )


def compose(m_outer: jnp.ndarray, m_inner: jnp.ndarray) -> jnp.ndarray:
    """Compose two inverse-map matrices: apply ``m_outer`` first on output
    coords, then ``m_inner`` (i.e. image-space: inner transform happens first)."""
    a = m_inner[:, :2] @ m_outer[:, :2]
    t = m_inner[:, :2] @ m_outer[:, 2] + m_inner[:, 2]
    return jnp.concatenate([a, t[:, None]], axis=1)


def _sample_bilinear(img: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
                     fill_mode: str = "zero") -> jnp.ndarray:
    """Bilinear sample a (H, W) or (H, W, C) image at float (rows, cols).

    fill_mode "zero": out-of-bounds samples contribute 0 (rotation fill).
    fill_mode "edge": coordinates clamp to the border (resize semantics).
    """
    H, W = img.shape[0], img.shape[1]
    if fill_mode == "edge":
        rows = jnp.clip(rows, 0.0, H - 1.0)
        cols = jnp.clip(cols, 0.0, W - 1.0)
    r0 = jnp.floor(rows)
    c0 = jnp.floor(cols)
    dr = rows - r0
    dc = cols - c0
    r0i = r0.astype(jnp.int32)
    c0i = c0.astype(jnp.int32)

    def gather(ri, ci):
        valid = (ri >= 0) & (ri < H) & (ci >= 0) & (ci < W)
        ri_c = jnp.clip(ri, 0, H - 1)
        ci_c = jnp.clip(ci, 0, W - 1)
        vals = img[ri_c, ci_c]
        if img.ndim == 3:
            valid = valid[..., None]
        return jnp.where(valid, vals, 0.0)

    v00 = gather(r0i, c0i)
    v01 = gather(r0i, c0i + 1)
    v10 = gather(r0i + 1, c0i)
    v11 = gather(r0i + 1, c0i + 1)
    if img.ndim == 3:
        dr = dr[..., None]
        dc = dc[..., None]
    top = v00 * (1 - dc) + v01 * dc
    bot = v10 * (1 - dc) + v11 * dc
    return top * (1 - dr) + bot * dr


@partial(jax.jit, static_argnums=(2, 3))
def affine_warp(img: jnp.ndarray, matrix: jnp.ndarray,
                out_shape: Tuple[int, int], fill_mode: str = "zero") -> jnp.ndarray:
    """Warp a (H, W) or (H, W, C) image by an inverse-map (2, 3) matrix."""
    out_h, out_w = out_shape
    rr = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    cc = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    rows = matrix[0, 0] * rr + matrix[0, 1] * cc + matrix[0, 2]
    cols = matrix[1, 0] * rr + matrix[1, 1] * cc + matrix[1, 2]
    return _sample_bilinear(img, rows, cols, fill_mode)


def affine_warp_video(video: jnp.ndarray, matrix: jnp.ndarray,
                      out_shape: Tuple[int, int], fill_mode: str = "zero") -> jnp.ndarray:
    """Warp every frame of a (T, H, W) or (T, H, W, C) clip with the same
    matrix (parity with RandomRotateVideo: one transform per clip)."""
    return jax.vmap(lambda f: affine_warp(f, matrix, out_shape, fill_mode))(video)
