import numpy as np
import pytest

from protoasnet_tpu.data.dataset import get_as_dataloader
from protoasnet_tpu.data.manifest import Manifest
from protoasnet_tpu.data.transforms import NORM_MEAN, NORM_STD


def _data_config(csv, frames=8, img=32, batch=4, augment=True, sampler="AS"):
    return {
        "data_info_file": csv,
        "view": "all",
        "sample_size": None,
        "sampler": sampler,
        "augmentation": augment,
        "transform_rotate_degrees": 10,
        "transform_min_crop_ratio": 0.7,
        "transform_time_dilation": 0.2,
        "normalize": True,
        "img_size": img,
        "frames": frames,
        "batch_size": batch,
        "iterate_intervals": True,
        "interval_unit": "cycle",
        "interval_quant": 1.0,
    }


def test_manifest_filtering(synthetic_csv):
    m_all = Manifest.from_csv(synthetic_csv, view="all", split="all")
    m_train = Manifest.from_csv(synthetic_csv, view="all", split="train")
    m_plax = Manifest.from_csv(synthetic_csv, view="plax", split="all")
    assert len(m_train) < len(m_all)
    assert len(m_plax) < len(m_all)
    assert (m_plax.df["view"] == "plax").all()
    w = m_all.class_sample_weights()
    assert w.shape == (len(m_all),)
    assert (w > 0).all()


def test_train_loader_shapes_and_stats(synthetic_csv):
    cfg = _data_config(synthetic_csv)
    loader = get_as_dataloader(cfg, split="train", mode="train", seed=0)
    batch = next(iter(loader))
    cine = np.asarray(batch["cine"])
    assert cine.shape == (4, 8, 32, 32, 3)
    assert cine.dtype == np.float32
    # channels identical (gray -> 3ch)
    assert np.allclose(cine[..., 0], cine[..., 2])
    # normalized: un-normalized values must lie in [0, 1]
    un = cine * NORM_STD + NORM_MEAN
    assert un.min() > -1e-3 and un.max() < 1.0 + 1e-3
    assert batch["target_AS"].shape == (4,)
    assert len(batch["filename"]) == 4


def test_eval_loader_iterates_intervals(synthetic_csv):
    cfg = _data_config(synthetic_csv, batch=5)
    loader = get_as_dataloader(cfg, split="val", mode="val", seed=0)
    m = Manifest.from_csv(synthetic_csv, view="all", split="val")
    n_expected = len(m.intervals)
    seen = 0
    for batch in loader:
        seen += int(batch["valid"].sum())
        # deterministic windows
        assert (batch["window_end"] > batch["window_start"]).all()
    assert seen == n_expected


def test_eval_deterministic(synthetic_csv):
    cfg = _data_config(synthetic_csv, augment=False)
    l1 = get_as_dataloader(cfg, split="val", mode="val", seed=0)
    l2 = get_as_dataloader(cfg, split="val", mode="val", seed=0)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    assert np.allclose(np.asarray(b1["cine"]), np.asarray(b2["cine"]))


def test_video_eval_batch_override(synthetic_csv):
    """eval_batch_size applies to video val/test loaders AND push (both
    forward-only: serving-sized batches, measured 1.34x push win at 128,
    experiments/push_batch_ab.py), never to train."""
    cfg = _data_config(synthetic_csv, batch=2)
    cfg["eval_batch_size"] = 6
    val = get_as_dataloader(cfg, split="val", mode="val", seed=0)
    assert val.batch_size == 6
    train = get_as_dataloader(cfg, split="train", mode="train", seed=0)
    assert train.batch_size == 2
    push = get_as_dataloader(cfg, split="train", mode="push", seed=0)
    assert push.batch_size == 6  # push rides the eval batch size
    cfg["push_batch_size"] = 4  # explicit override beats eval_batch_size
    assert get_as_dataloader(cfg, split="train", mode="push",
                             seed=0).batch_size == 4
    del cfg["push_batch_size"], cfg["eval_batch_size"]
    assert get_as_dataloader(cfg, split="train", mode="push",
                             seed=0).batch_size == 32  # legacy floor
    # epoch coverage unchanged: every interval still seen exactly once
    m = Manifest.from_csv(synthetic_csv, view="all", split="val")
    seen = sum(int(b["valid"].sum()) for b in val)
    assert seen == len(m.intervals)


def test_resolve_loader_batch_sizes():
    """Agent-level batch resolution (train/agents/base.py): device-multiple
    rounding, the video-eval parity default, and push precedence. Guards
    the regression where the rounded eval-150 IMAGE default leaked into
    VIDEO eval on multi-device meshes (batch-152 eval compiles in the
    agent suite; video eval must default to the train batch)."""
    from protoasnet_tpu.train.agents.base import resolve_loader_batch_sizes

    # video, no eval_batch_size, 8-dev mesh: NO eval size is inserted
    cfg = resolve_loader_batch_sizes(
        {"frames": 8, "img_size": 32}, {"batch_size": 3}, 8)
    assert cfg["batch_size"] == 8  # 3 rounded up to the mesh
    assert "eval_batch_size" not in cfg
    assert cfg["push_batch_size"] == 32  # max(batch, 32), already a multiple
    # explicit eval_batch_size: rounded, and push rides it
    cfg = resolve_loader_batch_sizes(
        {"frames": 8, "eval_batch_size": 130}, {"batch_size": 8}, 8)
    assert cfg["eval_batch_size"] == 136 and cfg["push_batch_size"] == 136
    # explicit push_batch_size wins over eval_batch_size
    cfg = resolve_loader_batch_sizes(
        {"frames": 8, "eval_batch_size": 128, "push_batch_size": 48},
        {"batch_size": 8}, 8)
    assert cfg["push_batch_size"] == 48 and cfg["eval_batch_size"] == 128
    # image mode without explicit size: the reference eval-150 default IS
    # rounded for the mesh (dataset.py applies 150 when absent)
    cfg = resolve_loader_batch_sizes({"frames": 1}, {"batch_size": 8}, 8)
    assert cfg["eval_batch_size"] == 152
    cfg = resolve_loader_batch_sizes({"frames": 1}, {"batch_size": 8}, 1)
    assert "eval_batch_size" not in cfg  # 150 % 1 == 0: nothing to round


def test_image_mode_squeezes_time(synthetic_csv):
    cfg = _data_config(synthetic_csv, frames=1)
    cfg["interval_unit"] = "image"
    cfg["eval_batch_size"] = 8
    loader = get_as_dataloader(cfg, split="train", mode="train", seed=0)
    batch = next(iter(loader))
    assert np.asarray(batch["cine"]).shape == (4, 32, 32, 3)


def test_temporal_resize_identity():
    import jax.numpy as jnp

    from protoasnet_tpu.data.transforms import temporal_resize

    clip = np.random.default_rng(0).random((8, 4, 4)).astype(np.float32)
    out = temporal_resize(jnp.asarray(clip), jnp.int32(8), 8)
    np.testing.assert_allclose(np.asarray(out), clip, atol=1e-6)
    # downsample by 2 = average of frame pairs at half-pixel centers
    out2 = np.asarray(temporal_resize(jnp.asarray(clip), jnp.int32(8), 4))
    expect = 0.5 * (clip[0] + clip[1])
    np.testing.assert_allclose(out2[0], expect, atol=1e-6)


def test_as_weighted_sampler_balances_classes(synthetic_csv):
    """The AS sampler draws classes near-uniformly regardless of the raw
    class frequencies (reference class_sampler_AS semantics)."""
    cfg = _data_config(synthetic_csv, batch=6, augment=False, sampler="AS")
    loader = get_as_dataloader(cfg, split="all", mode="train", seed=0)
    counts = np.zeros(3)
    for epoch in range(6):
        loader.set_epoch(epoch)
        for b in loader:
            t = np.asarray(b["target_AS"])[np.asarray(b["valid"])]
            counts += np.bincount(t, minlength=3)
    frac = counts / counts.sum()
    assert frac.max() - frac.min() < 0.15, f"class draw fractions {frac}"


def test_multi_worker_epoch_matches_single_worker(synthetic_csv):
    """num_workers > 1 must reproduce the 1-worker epoch exactly: the
    gather RNG is keyed per (seed, epoch, batch), so parallel assembly is
    order-independent (reference property via torch DataLoader worker
    seeding, as_dataloader.py:59-66)."""
    cfg = _data_config(synthetic_csv)
    a = get_as_dataloader({**cfg, "num_workers": 1}, "train", "train", seed=3)
    b = get_as_dataloader({**cfg, "num_workers": 4}, "train", "train", seed=3)
    ba, bb = list(a), list(b)
    assert len(ba) == len(bb) > 1
    for x, y in zip(ba, bb):
        np.testing.assert_array_equal(np.asarray(x["cine"]),
                                      np.asarray(y["cine"]))
        np.testing.assert_array_equal(x["target_AS"], y["target_AS"])
        np.testing.assert_array_equal(x["window_start"], y["window_start"])
        assert x["filename"] == y["filename"]
    # and a re-iteration of the same epoch is deterministic
    bb2 = list(b)
    np.testing.assert_array_equal(np.asarray(bb[0]["cine"]),
                                  np.asarray(bb2[0]["cine"]))
    # different epochs draw different windows under augmentation
    b.set_epoch(1)
    bb3 = list(b)
    assert not np.array_equal(np.asarray(bb[0]["cine"]),
                              np.asarray(bb3[0]["cine"]))


@pytest.mark.parametrize("num_workers", [1, 3])
def test_producer_error_propagates_to_consumer(synthetic_csv, num_workers):
    """A gather failure in the producer thread (or a worker-pool thread)
    must re-raise in the consumer loop instead of silently truncating the
    epoch (torch DataLoader worker-error semantics)."""
    cfg = _data_config(synthetic_csv, batch=2)
    loader = get_as_dataloader({**cfg, "num_workers": num_workers},
                               "train", "train", seed=0)
    assert len(loader) > 2

    boom_calls = {"n": 0}
    orig_gather = loader.dataset.gather

    def flaky_gather(items, rng):
        boom_calls["n"] += 1
        if boom_calls["n"] == 2:
            raise ValueError("synthetic decode failure")
        return orig_gather(items, rng)

    loader.dataset.gather = flaky_gather
    with pytest.raises(RuntimeError, match="dataloader worker failed"):
        for _ in loader:
            pass


@pytest.mark.parametrize("num_workers", [1, 3])
def test_keyboard_interrupt_not_rewrapped(synthetic_csv, num_workers):
    """Ctrl-C during a host gather surfaces as KeyboardInterrupt, not as
    a 'dataloader worker failed' RuntimeError — the latter misreports a
    user abort as a data bug and is swallowed by any upstream
    except-Exception retry logic, which would resume training."""
    cfg = _data_config(synthetic_csv, batch=2)
    loader = get_as_dataloader({**cfg, "num_workers": num_workers},
                               "train", "train", seed=0)
    calls = {"n": 0}
    orig_gather = loader.dataset.gather

    def interrupted_gather(items, rng):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt
        return orig_gather(items, rng)

    loader.dataset.gather = interrupted_gather
    with pytest.raises(KeyboardInterrupt):
        for _ in loader:
            pass
