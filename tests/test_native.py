"""Native C++ data-loader core: builds, loads, and matches NumPy/cv2."""

import numpy as np
import pytest

from protoasnet_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_gather_windows_matches_numpy(lib):
    rng = np.random.default_rng(0)
    store = rng.integers(0, 256, size=(50, 6, 7), dtype=np.uint8)
    offsets = np.array([0, 20, 35], dtype=np.int64)  # videos of 20/15/15 frames
    vids = np.array([0, 1, 2, 1], dtype=np.int32)
    starts = np.array([2, 0, 5, 10], dtype=np.int32)
    ends = np.array([10, 15, 15, 13], dtype=np.int32)
    t_max = 15
    out = native.gather_windows(store, offsets, vids, starts, ends, t_max)
    assert out.shape == (4, 15, 6, 7)
    for k in range(4):
        n = ends[k] - starts[k]
        base = offsets[vids[k]]
        np.testing.assert_array_equal(out[k, :n],
                                      store[base + starts[k]: base + ends[k]])
        assert (out[k, n:] == 0).all()


def test_resize_downscale_matches_cv2_area(lib):
    import cv2

    rng = np.random.default_rng(1)
    video = rng.integers(0, 256, size=(5, 48, 64), dtype=np.uint8)
    out = native.resize_video_u8(video, 16)
    assert out.shape == (5, 16, 16)
    for t in range(5):
        ref = cv2.resize(video[t], (16, 16), interpolation=cv2.INTER_AREA)
        diff = np.abs(out[t].astype(int) - ref.astype(int))
        assert diff.max() <= 1, f"frame {t}: max diff {diff.max()}"


def test_resize_upscale_matches_cv2_linear(lib):
    import cv2

    rng = np.random.default_rng(2)
    video = rng.integers(0, 256, size=(3, 10, 12), dtype=np.uint8)
    out = native.resize_video_u8(video, 24)
    for t in range(3):
        ref = cv2.resize(video[t], (24, 24), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(out[t].astype(int) - ref.astype(int))
        assert diff.max() <= 1


def test_dataset_gather_uses_native_and_matches(synthetic_csv):
    """End-to-end: batches from the loader are identical with and without
    the native path."""
    from protoasnet_tpu.data.dataset import get_as_dataloader

    cfg = {"data_info_file": synthetic_csv, "view": "all", "sample_size": None,
           "sampler": "random", "augmentation": False, "normalize": True,
           "img_size": 32, "frames": 8, "batch_size": 4,
           "iterate_intervals": True, "interval_unit": "cycle",
           "interval_quant": 1.0}
    loader = get_as_dataloader(cfg, "val", "val", seed=0)
    b_native = next(iter(loader))

    # force fallback
    orig = native.gather_windows
    try:
        native.gather_windows = lambda *a, **k: None
        loader2 = get_as_dataloader(cfg, "val", "val", seed=0)
        b_numpy = next(iter(loader2))
    finally:
        native.gather_windows = orig
    np.testing.assert_allclose(np.asarray(b_native["cine"]),
                               np.asarray(b_numpy["cine"]))
