"""MXU-native warps vs the gather-based reference warp."""

import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.ops.affine import (
    affine_warp_video,
    crop_resize_matrix,
    rotate_scale_matrix,
)
from protoasnet_tpu.ops.affine_fast import (
    crop_resize_video,
    rotate_scale_video,
    rotate_video,
    scale_about_center,
)


def _smooth_video(t=2, h=24, w=24, c=None, seed=0):
    """Band-limited image so interpolation-scheme differences stay small."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for i in range(t):
        f = np.zeros((h, w), np.float32)
        for _ in range(4):
            fy, fx = rng.uniform(0.05, 0.2, 2)
            ph = rng.uniform(0, 6.3)
            f += np.sin(fy * yy + fx * xx + ph)
        frames.append(f)
    v = np.stack(frames) * 0.2 + 0.5
    if c:
        v = np.repeat(v[..., None], c, axis=-1)
    return v.astype(np.float32)


def test_scale_matches_gather_exactly():
    v = _smooth_video()
    for s in (0.7, 1.0, 1.4):
        m = rotate_scale_matrix(jnp.float32(0.0), jnp.float32(s), 24, 24)
        ref = np.asarray(affine_warp_video(jnp.asarray(v), m, (24, 24)))
        out = np.asarray(scale_about_center(jnp.asarray(v), jnp.float32(s)))
        np.testing.assert_allclose(out, ref, atol=1e-4, err_msg=f"scale {s}")


def test_crop_resize_matches_gather_exactly():
    v = _smooth_video(c=3, seed=1)
    m = crop_resize_matrix(jnp.float32(3), jnp.float32(2), jnp.float32(15),
                           jnp.float32(18), 24, 24)
    ref = np.asarray(affine_warp_video(jnp.asarray(v), m, (24, 24)))
    out = np.asarray(crop_resize_video(jnp.asarray(v), jnp.float32(3),
                                       jnp.float32(2), jnp.float32(15),
                                       jnp.float32(18), (24, 24)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_rotation_close_to_gather():
    v = _smooth_video(h=32, w=32, seed=2)
    for ang in (-18.0, 7.0, 20.0):
        m = rotate_scale_matrix(jnp.float32(ang), jnp.float32(1.0), 32, 32)
        ref = np.asarray(affine_warp_video(jnp.asarray(v), m, (32, 32)))
        out = np.asarray(rotate_video(jnp.asarray(v), jnp.float32(ang)))
        # compare away from the border (fill-region shapes differ slightly)
        diff = np.abs(out - ref)[:, 6:-6, 6:-6]
        assert np.median(diff) < 0.01, f"angle {ang}: median {np.median(diff)}"
        assert diff.mean() < 0.02, f"angle {ang}: mean {diff.mean()}"


def test_rotate_scale_combined():
    v = _smooth_video(h=32, w=32, seed=3)
    m = rotate_scale_matrix(jnp.float32(12.0), jnp.float32(1.2), 32, 32)
    ref = np.asarray(affine_warp_video(jnp.asarray(v), m, (32, 32)))
    out = np.asarray(rotate_scale_video(jnp.asarray(v), jnp.float32(12.0),
                                        jnp.float32(1.2)))
    diff = np.abs(out - ref)[:, 6:-6, 6:-6]
    assert np.median(diff) < 0.015


def test_fast_warp_differentiable():
    import jax

    v = jnp.asarray(_smooth_video(seed=4))

    def f(x):
        return jnp.sum(rotate_scale_video(x, jnp.float32(10.0),
                                          jnp.float32(0.8)) ** 2)

    g = jax.grad(f)(v)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
