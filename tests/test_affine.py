import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.ops.affine import (
    affine_warp,
    affine_warp_video,
    compose,
    crop_resize_matrix,
    rotate_scale_matrix,
)


def test_identity_rotation():
    img = np.random.default_rng(0).random((16, 16)).astype(np.float32)
    m = rotate_scale_matrix(jnp.float32(0.0), jnp.float32(1.0), 16, 16)
    out = affine_warp(jnp.asarray(img), m, (16, 16))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)


def test_rotation_180_is_flip():
    img = np.arange(64, dtype=np.float32).reshape(8, 8)
    m = rotate_scale_matrix(jnp.float32(180.0), jnp.float32(1.0), 8, 8)
    out = np.asarray(affine_warp(jnp.asarray(img), m, (8, 8)))
    np.testing.assert_allclose(out, img[::-1, ::-1], atol=1e-4)


def test_scale_zoom_in_center_preserved():
    rng = np.random.default_rng(1)
    img = rng.random((33, 33)).astype(np.float32)
    m = rotate_scale_matrix(jnp.float32(0.0), jnp.float32(2.0), 33, 33)
    out = np.asarray(affine_warp(jnp.asarray(img), m, (33, 33)))
    # center pixel maps to itself
    np.testing.assert_allclose(out[16, 16], img[16, 16], atol=1e-5)


def test_crop_full_is_identity():
    img = np.random.default_rng(2).random((12, 12)).astype(np.float32)
    m = crop_resize_matrix(jnp.float32(0), jnp.float32(0), jnp.float32(12),
                           jnp.float32(12), 12, 12)
    out = np.asarray(affine_warp(jnp.asarray(img), m, (12, 12)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_crop_quadrant():
    img = np.zeros((8, 8), np.float32)
    img[:4, :4] = 1.0
    # crop the top-left 4x4 quadrant up to 8x8: interior is all ones
    # (the last half-pixel at the crop border interpolates into neighboring
    # image content — fused-warp semantics, not torch crop-then-resize)
    m = crop_resize_matrix(jnp.float32(0), jnp.float32(0), jnp.float32(4),
                           jnp.float32(4), 8, 8)
    out = np.asarray(affine_warp(jnp.asarray(img), m, (8, 8), "edge"))
    assert out[:7, :7].min() > 0.99


def test_compose_equals_sequential():
    rng = np.random.default_rng(3)
    img = rng.random((32, 32)).astype(np.float32)
    m_crop = crop_resize_matrix(jnp.float32(4), jnp.float32(2), jnp.float32(20),
                                jnp.float32(24), 32, 32)
    m_rot = rotate_scale_matrix(jnp.float32(30.0), jnp.float32(1.1), 32, 32)
    seq = affine_warp(affine_warp(jnp.asarray(img), m_crop, (32, 32)), m_rot, (32, 32))
    fused = affine_warp(jnp.asarray(img), compose(m_rot, m_crop), (32, 32))
    # fused single resample vs two resamples agree away from interpolation error
    diff = np.abs(np.asarray(seq) - np.asarray(fused))
    assert np.median(diff) < 0.05


def test_video_warp_same_matrix_every_frame():
    vid = np.random.default_rng(4).random((3, 10, 10)).astype(np.float32)
    m = rotate_scale_matrix(jnp.float32(15.0), jnp.float32(0.9), 10, 10)
    out = np.asarray(affine_warp_video(jnp.asarray(vid), m, (10, 10)))
    per_frame = np.stack(
        [np.asarray(affine_warp(jnp.asarray(vid[t]), m, (10, 10))) for t in range(3)]
    )
    np.testing.assert_allclose(out, per_frame, atol=1e-6)


def test_warp_is_differentiable():
    import jax

    img = jnp.asarray(np.random.default_rng(5).random((8, 8)).astype(np.float32))

    def f(x):
        m = rotate_scale_matrix(jnp.float32(10.0), jnp.float32(1.2), 8, 8)
        return jnp.sum(affine_warp(x, m, (8, 8)) ** 2)

    g = jax.grad(f)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
