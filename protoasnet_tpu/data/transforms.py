"""Device-side fused input transforms (XLA-compiled).

The reference does window slicing + trilinear resize + normalize + augment
on the host with scipy/skimage/torchvision per sample
(/root/reference/src/data/as_dataloader.py:184-231). Here the host only
gathers fixed-size uint8 windows from the packed CineStore; everything
arithmetic — temporal resize, random-resized-crop + rotation (one fused
bilinear warp), [0,1] scaling, normalization, channel expansion — runs as
one jitted XLA program on device, so input prep overlaps training compute
and never bottlenecks on the (single-core) host.

Conventions:
* clips are channels-last: (B, T, S, S) uint8 in, (B, T, S, S, 3) float out
  (or (B, S, S, 3) for single-frame image models);
* normalization constants live HERE ONLY (m=0.099, std=0.171 — the
  reference duplicates them across 3 files, SURVEY.md §7 known-bugs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from protoasnet_tpu.ops.affine_fast import crop_resize_video, rotate_video

# Dataset intensity statistics (reference bin_to_norm, as_dataloader.py:174-182).
NORM_MEAN = 0.099
NORM_STD = 0.171

__all__ = ["NORM_MEAN", "NORM_STD", "make_preprocess_fn", "normalize", "unnormalize",
           "temporal_resize"]


def normalize(x: jnp.ndarray) -> jnp.ndarray:
    return (x - NORM_MEAN) / NORM_STD


def unnormalize(x: jnp.ndarray) -> jnp.ndarray:
    return x * NORM_STD + NORM_MEAN


def temporal_resize(clip: jnp.ndarray, t_len: jnp.ndarray, frames_out: int) -> jnp.ndarray:
    """Linear resample of the first ``t_len`` frames of a padded clip to
    ``frames_out`` frames (half-pixel centers; static shapes).

    clip: (T_max, S, S) float; t_len: () int32 — valid prefix length.
    """
    t_max = clip.shape[0]
    t_len_f = t_len.astype(jnp.float32)
    j = jax.lax.broadcasted_iota(jnp.float32, (frames_out, 1), 0)[:, 0]
    src = (j + 0.5) * (t_len_f / frames_out) - 0.5
    src = jnp.clip(src, 0.0, t_len_f - 1.0)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_len - 1)
    w = (src - lo.astype(jnp.float32))[:, None, None]
    lo = jnp.clip(lo, 0, t_max - 1)
    hi = jnp.clip(hi, 0, t_max - 1)
    return clip[lo] * (1.0 - w) + clip[hi] * w


def _sample_crop_params(rng, img_size: int, min_crop_ratio: float):
    """RandomResizedCrop parameter sampling: area scale in
    (min_crop_ratio, 1), aspect ratio in (3/4, 4/3), uniform position.
    Matches torchvision RandomResizedCropVideo semantics used by the
    reference (as_dataloader.py:129)."""
    k_area, k_ratio, k_top, k_left = jax.random.split(rng, 4)
    area = jax.random.uniform(k_area, (), minval=min_crop_ratio, maxval=1.0) * (
        img_size * img_size
    )
    log_ratio = jax.random.uniform(
        k_ratio, (), minval=jnp.log(3.0 / 4.0), maxval=jnp.log(4.0 / 3.0)
    )
    ratio = jnp.exp(log_ratio)
    w = jnp.sqrt(area * ratio)
    h = jnp.sqrt(area / ratio)
    w = jnp.clip(w, 1.0, img_size)
    h = jnp.clip(h, 1.0, img_size)
    top = jax.random.uniform(k_top, (), minval=0.0, maxval=1.0) * (img_size - h)
    left = jax.random.uniform(k_left, (), minval=0.0, maxval=1.0) * (img_size - w)
    return top, left, h, w


def sample_augment_params(rng, img_size: int, min_crop_ratio: float,
                          rotate_degrees: float):
    """All per-clip augmentation randomness in one place: crop box
    (RandomResizedCropVideo semantics, as_dataloader.py:129) + rotation
    angle (RandomRotateVideo, video_transforms.py:25-26: uniform in
    [-degrees, +degrees]). Split out so the parameter DISTRIBUTIONS are
    unit-testable — a silently narrowed range trains differently while
    passing every tensor-level test (VERDICT r3 weak #6)."""
    k_crop, k_rot = jax.random.split(rng)
    top, left, h, w = _sample_crop_params(k_crop, img_size, min_crop_ratio)
    angle = jax.random.uniform(k_rot, (), minval=-rotate_degrees,
                               maxval=rotate_degrees)
    return top, left, h, w, angle


def _augment(rng, clip, img_size: int, min_crop_ratio: float,
             rotate_degrees: float):
    """Random-resized-crop then rotate, as MXU-native resamplings
    (ops/affine_fast.py) — no gathers in the input pipeline."""
    top, left, h, w, angle = sample_augment_params(
        rng, img_size, min_crop_ratio, rotate_degrees)
    clip = crop_resize_video(clip, top, left, h, w, (img_size, img_size))
    return rotate_video(clip, angle)


def make_preprocess_fn(
    frames_out: int,
    img_size: int,
    do_normalize: bool = True,
    augment: bool = False,
    rotate_degrees: float = 10.0,
    min_crop_ratio: float = 0.7,
):
    """Build the jitted (B, T_max, S, S) uint8 -> model-input transform.

    Returns fn(clips_u8, t_len, rng) -> (B, frames_out, S, S, 3) float32
    (or (B, S, S, 3) when frames_out == 1, matching the reference's image
    squeeze at as_dataloader.py:219-220).
    """

    def _one(clip_u8, t_len, rng):
        x = clip_u8.astype(jnp.float32) * (1.0 / 255.0)  # (T_max, S, S) in [0,1]
        x = temporal_resize(x, t_len, frames_out)  # (frames_out, S, S)
        if augment:
            x = _augment(rng, x, img_size, min_crop_ratio, rotate_degrees)
        if do_normalize:
            x = normalize(x)
        x = jnp.broadcast_to(x[..., None], x.shape + (3,))  # gray -> 3ch
        return x

    @jax.jit
    def preprocess(clips_u8: jnp.ndarray, t_len: jnp.ndarray, rng: Optional[jnp.ndarray]):
        b = clips_u8.shape[0]
        if rng is None:
            rngs = jnp.zeros((b, 2), dtype=jnp.uint32)
        else:
            rngs = jax.random.split(rng, b)
        out = jax.vmap(_one)(clips_u8, t_len, rngs)
        if frames_out == 1:
            out = out[:, 0]  # (B, S, S, 3)
        return out

    return preprocess
