"""Pin the data-layer randomness to reference semantics (VERDICT r3 #6).

The trajectory suite feeds identical tensors, so the loader's random draws
— AS class-balancing sampler, window-size jitter, augmentation parameter
ranges — had no test: a silently narrower range would pass every tensor-
level test and still train differently. Exact assertions where the
reference is deterministic, fixed-seed distributional checks otherwise.

Reference semantics pinned here:
* class_sampler_AS (as_dataloader.py:135-144): WeightedRandomSampler with
  per-sample weight 1/count(class), num_samples = len(dataset), i.e. draws
  WITH replacement and per-class draw frequency ~ uniform regardless of
  class imbalance. (The reference indexes `value_counts().to_numpy()` by
  label id — correct only when labels sorted by frequency coincide with
  label order; we implement the intended inverse-frequency semantics via
  bincount, manifest.py.)
* window draw (as_dataloader.py:249-255): image unit -> fixed
  int(interval_quant) frames; cycle/second unit -> wsize =
  max(int(window_size * uniform(1-ttd, 1+ttd)), 1), then a uniform-start
  window [start, start+wsize) with start in [0, frames-wsize].
* RandomResizedCropVideo(scale=(min_crop_ratio, 1)) (as_dataloader.py:129):
  crop area uniform in [s*A, A], aspect ratio log-uniform in [3/4, 4/3],
  uniform position; RandomRotateVideo(degrees) (video_transforms.py:25-26):
  angle uniform in [-degrees, +degrees].
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from protoasnet_tpu.data.dataset import get_as_dataloader
from protoasnet_tpu.data.manifest import Manifest


def _data_config(csv, frames=8, img=32, batch=4, **over):
    cfg = {
        "data_info_file": csv, "view": "all", "sample_size": None,
        "sampler": "AS", "augmentation": True,
        "transform_rotate_degrees": 10, "transform_min_crop_ratio": 0.7,
        "transform_time_dilation": 0.2, "normalize": True,
        "img_size": img, "frames": frames, "batch_size": batch,
        "iterate_intervals": False, "interval_unit": "cycle",
        "interval_quant": 1.0,
    }
    cfg.update(over)
    return cfg


@pytest.fixture(scope="module")
def unbalanced_csv(synthetic_csv, tmp_path_factory):
    """Synthetic manifest rewritten to a 12/4/2 class split (all train)."""
    df = pd.read_csv(synthetic_csv)
    labels = [0] * 12 + [1] * 4 + [2] * 2
    df = df.iloc[: len(labels)].copy()
    df["as_label"] = labels
    df["split"] = "train"
    out = str(tmp_path_factory.mktemp("unbal") / "manifest.csv")
    df.to_csv(out, index=False)
    return out


# ---------------- AS sampler ----------------


def test_class_sample_weights_exact(unbalanced_csv):
    m = Manifest.from_csv(unbalanced_csv, view="all", split="train")
    w = m.class_sample_weights()
    # inverse class frequency, exactly (reference weight_as = 1/count)
    assert np.allclose(w[:12], 1.0 / 12)
    assert np.allclose(w[12:16], 1.0 / 4)
    assert np.allclose(w[16:], 1.0 / 2)


def test_as_sampler_draws_with_replacement_uniform_classes(unbalanced_csv):
    cfg = _data_config(unbalanced_csv, sampler="AS")
    loader = get_as_dataloader(cfg, split="train", mode="train", seed=0)
    labels = loader.dataset.manifest.labels
    n = len(loader.dataset)
    assert n == 18
    rng = np.random.default_rng(0)
    counts = np.zeros(3)
    saw_duplicate = False
    for _ in range(300):
        order = loader._order(rng)
        assert len(order) == n  # num_samples = len(dataset)
        saw_duplicate |= len(np.unique(order)) < n
        counts += np.bincount(labels[order], minlength=3)
    # WeightedRandomSampler samples WITH replacement
    assert saw_duplicate
    # inverse-frequency weights -> per-class draw frequency ~ 1/3 each
    freq = counts / counts.sum()
    assert np.all(np.abs(freq - 1 / 3) < 0.03), freq


def test_random_sampler_is_permutation(unbalanced_csv):
    """sampler != AS: plain shuffle — every sample exactly once."""
    cfg = _data_config(unbalanced_csv, sampler="random")
    loader = get_as_dataloader(cfg, split="train", mode="train", seed=0)
    order = loader._order(np.random.default_rng(0))
    assert sorted(order.tolist()) == list(range(len(loader.dataset)))


# ---------------- window-size jitter ----------------


def test_window_jitter_bounds_and_coverage(synthetic_csv):
    cfg = _data_config(synthetic_csv, transform_time_dilation=0.2)
    loader = get_as_dataloader(cfg, split="train", mode="train", seed=0)
    ds = loader.dataset
    assert ds.ttd == 0.2
    rng = np.random.default_rng(0)
    for vid in range(min(4, len(ds))):
        base = int(ds.manifest.window_size[vid])
        n_frames = int(ds.manifest.frames[vid])
        sizes = []
        for _ in range(400):
            v, start, end, iidx = ds.sample_window(vid, rng)
            assert v == vid and iidx == 0
            w = end - start
            if w < n_frames:  # not truncated by the video length
                # max(int(base * U(0.8, 1.2)), 1)
                assert int(base * 0.8) <= w <= int(base * 1.2), (w, base)
            assert 0 <= start and end <= n_frames
            sizes.append(w)
        sizes = np.asarray(sizes)
        if int(base * 1.2) < n_frames and base >= 10:
            # the draw must COVER the range, not hug the center: both
            # outer deciles hit within 400 draws
            assert sizes.min() <= int(base * 0.84)
            assert sizes.max() >= int(base * 1.16)


def test_window_no_jitter_in_eval_and_image_unit(synthetic_csv):
    # eval mode: ttd forced to 0 -> deterministic window size
    cfg = _data_config(synthetic_csv)
    ds = get_as_dataloader(cfg, split="val", mode="val",
                           seed=0).dataset
    assert ds.ttd == 0.0
    # image unit: fixed frames window regardless of ttd
    cfg_img = _data_config(synthetic_csv, interval_unit="image",
                           interval_quant=8.0, frames=8)
    dsi = get_as_dataloader(cfg_img, split="train", mode="train",
                            seed=0).dataset
    rng = np.random.default_rng(1)
    for vid in range(min(4, len(dsi))):
        n_frames = int(dsi.manifest.frames[vid])
        for _ in range(10):
            _, start, end, _ = dsi.sample_window(vid, rng)
            assert end - start == min(8, n_frames)
    # window START still varies (uniform over [0, frames - wsize])
    starts = {dsi.sample_window(0, rng)[1] for _ in range(200)}
    if int(dsi.manifest.frames[0]) > 8:
        assert len(starts) > 5


# ---------------- augmentation parameter ranges ----------------


def test_augment_param_ranges():
    import jax

    from protoasnet_tpu.data.transforms import sample_augment_params

    img, min_ratio, degrees = 112, 0.7, 10.0
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    top, left, h, w, angle = jax.vmap(
        lambda k: sample_augment_params(k, img, min_ratio, degrees))(keys)
    top, left, h, w, angle = map(np.asarray, (top, left, h, w, angle))

    # rotation: uniform in [-10, 10] — bounds AND coverage of both tails
    assert angle.min() >= -degrees and angle.max() <= degrees
    assert angle.min() < -0.9 * degrees and angle.max() > 0.9 * degrees
    assert abs(np.mean(angle)) < 0.75  # symmetric (se ~ 0.13, 5 sigma)

    # crop area: uniform in [0.7, 1.0] x img^2 (before the <=img clamp)
    area_frac = (h * w) / (img * img)
    assert area_frac.min() >= min_ratio - 0.05
    assert area_frac.max() <= 1.0 + 1e-5
    assert area_frac.min() <= min_ratio + 0.03  # low tail actually drawn
    assert area_frac.max() >= 0.97

    # aspect ratio: log-uniform in [3/4, 4/3] where the box is unclamped
    unclamped = (w < img - 1e-3) & (h < img - 1e-3)
    ar = (w / h)[unclamped]
    assert len(ar) > 500
    assert ar.min() >= 3 / 4 - 1e-3 and ar.max() <= 4 / 3 + 1e-3
    assert ar.min() < 0.80 and ar.max() > 1.25  # both tails covered

    # position: inside the frame, and the corners are reachable
    assert (top >= -1e-3).all() and (top + h <= img + 1e-3).all()
    assert (left >= -1e-3).all() and (left + w <= img + 1e-3).all()
    assert top.min() < 1.0 and left.min() < 1.0


def test_augment_ranges_respond_to_config():
    """The knobs actually reach the sampler (not hard-coded defaults)."""
    import jax

    from protoasnet_tpu.data.transforms import sample_augment_params

    keys = jax.random.split(jax.random.PRNGKey(1), 2000)
    _, _, h, w, angle = jax.vmap(
        lambda k: sample_augment_params(k, 64, 0.95, 2.0))(keys)
    angle, h, w = np.asarray(angle), np.asarray(h), np.asarray(w)
    assert np.abs(angle).max() <= 2.0
    # area bound holds where the box wasn't clamped to the frame (a
    # clamped edge shrinks the product below the drawn area)
    unclamped = (w < 64 - 1e-3) & (h < 64 - 1e-3)
    assert unclamped.sum() > 50
    assert ((h * w)[unclamped] / (64 * 64)).min() >= 0.95 - 0.05
