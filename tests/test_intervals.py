"""Interval computation parity tests vs hand-computed values derived from
the reference semantics (/root/reference/src/data/as_dataloader.py:260-325)."""

import numpy as np
import pytest

from protoasnet_tpu.data.intervals import compute_intervals, compute_window_sizes


def test_cycle_window_size():
    # one cycle = 60000 / frame_time / heart_rate frames
    frames = np.array([100])
    ft = np.array([20.0])  # ms per frame -> 50 fps
    hr = np.array([60.0])  # 1 beat per second -> 50 frames per cycle
    w = compute_window_sizes(frames, ft, hr, "cycle", 1.0)
    assert w[0] == 50


def test_second_and_image_units():
    frames = np.array([100, 40])
    ft = np.array([25.0, 40.0])  # 40 fps, 25 fps
    hr = np.array([60.0, 60.0])
    w = compute_window_sizes(frames, ft, hr, "second", 1.0)
    assert list(w) == [40, 25]
    w = compute_window_sizes(frames, ft, hr, "image", 1.0)
    assert list(w) == [1, 1]


def test_interval_table_expansion():
    frames = np.array([100, 30, 10])
    ft = np.array([20.0, 20.0, 20.0])
    hr = np.array([60.0, 60.0, 60.0])  # window 50 everywhere
    window, n_int, table = compute_intervals(frames, ft, hr, "cycle", 1.0)
    assert list(window) == [50, 50, 50]
    assert list(n_int) == [2, 0, 0]
    # video 0: 2 intervals [0,50), [50,100); videos 1,2: full-length fallback
    assert list(table.video_idx) == [0, 0, 1, 2]
    assert list(table.interval_idx) == [0, 1, 0, 0]
    assert list(table.start_frame) == [0, 50, 0, 0]
    assert list(table.end_frame) == [50, 100, 30, 10]


def test_zero_window_raises():
    with pytest.raises(ValueError):
        compute_window_sizes(np.array([10]), np.array([2000.0]), np.array([600.0]),
                             "cycle", 1.0)


def test_empty_manifest_returns_empty_table():
    """Regression: an empty split/view filter used to crash np.repeat with
    an opaque broadcast error instead of yielding an empty table."""
    e = np.zeros(0)
    window, n_int, table = compute_intervals(e, e, e, "cycle", 1.0)
    assert len(window) == 0 and len(n_int) == 0 and len(table) == 0
