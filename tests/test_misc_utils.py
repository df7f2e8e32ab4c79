import os

import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.models.layers import prototype_class_identity
from protoasnet_tpu.models.surgery import prune_prototypes
from protoasnet_tpu.utils.preprocess import (
    preprocess_input_function,
    undo_preprocess_input_function,
)
from protoasnet_tpu.utils.profiling import StepTimer


def test_prune_prototypes_shapes_and_forward():
    from protoasnet_tpu.models.builder import build_model, init_model

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (8, 32, 1, 1, 1),
           "num_classes": 4, "img_size": 32}
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 32, 32, 3)),
                    jnp.float32)
    params, stats = init_model(model, x, seed=0)
    ident = prototype_class_identity(8, 4)
    new_params, new_ident, keep = prune_prototypes(params, ident, [1, 5])
    assert new_params["prototype_vectors"].shape == (6, 32)
    assert new_params["last_layer"]["Dense_0"]["kernel"].shape == (6, 4)
    assert new_ident.shape == (6, 4)
    assert keep == [0, 2, 3, 4, 6, 7]
    import jax

    # pruned model forward works with a shrunk config
    cfg2 = dict(cfg, prototype_shape=(6, 32, 1, 1, 1))
    model2 = build_model(cfg2)
    logits, sim, occ = jax.jit(
        lambda v, xx: model2.apply(v, xx, train=False))(
            {"params": new_params, "batch_stats": stats}, x)
    assert logits.shape == (1, 4) and sim.shape == (1, 6)
    assert occ.shape[-1] == 6
    # kept prototypes' behavior is preserved: similarity of kept rows equals
    # the original model's at the same indices
    logits0, sim0, _ = jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(
            {"params": params, "batch_stats": stats}, x)
    np.testing.assert_allclose(np.asarray(sim)[0],
                               np.asarray(sim0)[0][np.asarray(keep)],
                               rtol=1e-5, atol=1e-5)


def test_imagenet_preprocess_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, size=(2, 4, 4, 3)),
                    jnp.float32)
    y = undo_preprocess_input_function(preprocess_input_function(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_step_timer():
    import time

    t = StepTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["a"] >= 0.01 and t.counts["a"] == 2 and "b" in s
    t.log("test ")  # must not raise


def test_trace_noop_without_dir():
    from protoasnet_tpu.utils.profiling import trace

    with trace(None):
        pass  # no-op path


def test_epoch_metrics_accepts_bfloat16():
    import ml_dtypes  # noqa: F401  (bf16 numpy dtype)

    from protoasnet_tpu.train.metrics import EpochMetrics

    m = EpochMetrics(num_classes=4, abstain_class=True, num_prototypes=8)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(16, 4)), jnp.bfloat16)
    sims = jnp.asarray(rng.uniform(0.1, 1, size=(16, 8)), jnp.bfloat16)
    target = np.concatenate([np.zeros(6), np.ones(5), np.full(5, 2)]).astype(int)
    m.update(np.asarray(logits), target, np.ones(16, bool),
             similarities=np.asarray(sims))
    out = m.compute()
    assert np.isfinite(out["AUC"]) and out["AUC"] >= 0
    assert np.isfinite(out["f1_mean"])


def test_compose_and_mp4_writer(tmp_path):
    """PIL frame composer + OpenCV MP4 writer (no ffmpeg in this env):
    frames must compose with caption space and the MP4 must read back with
    the right frame count."""
    import numpy as np

    from protoasnet_tpu.explain.render import (
        compose_panel_frame, write_video_frames)

    rng = np.random.default_rng(0)
    panels = [rng.uniform(size=(56, 56, 3)).astype(np.float32) for _ in range(4)]
    frame = compose_panel_frame(panels, "title", labels=("a", "b", "c", "d"),
                                colorbar=True)
    assert frame.dtype == np.uint8 and frame.ndim == 3
    assert frame.shape[0] > 112  # caption + labels above the 2x-scaled panels

    frames = [frame] * 7
    out = write_video_frames(frames, str(tmp_path / "clip.mp4"), fps=5)
    assert out is not None and out.endswith(".mp4")

    import cv2

    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 7


def test_render_clip_panels_matches_per_frame_path():
    """The uint8-resident whole-clip renderer stays within +-2/255 per
    pixel of stacking the per-frame float _proto_frame reference path
    (integer fixed-point blends vs float truncation), with the layout and
    caption strip byte-identical — the explain/push visualization speedup
    must not visibly change the output."""
    import numpy as np

    from protoasnet_tpu.explain.render import _proto_frame, render_clip_panels

    rng = np.random.default_rng(3)
    t, h, w = 4, 40, 48
    unnorm = rng.uniform(size=(t, h, w, 3)).astype(np.float32)
    rescaled = rng.uniform(size=(t, h, w)).astype(np.float32)
    title = "p_03 | vid_7 | pred = ['0.10', '0.80'] | gt = 1"

    fast = render_clip_panels(unnorm, rescaled, title)
    for i in range(t):
        ref = _proto_frame(unnorm[i], rescaled[i], title)
        assert fast[i].shape == ref.shape
        diff = np.abs(fast[i].astype(np.int16) - ref.astype(np.int16))
        assert diff.max() <= 2, f"frame {i}: max pixel diff {diff.max()}"
        # caption + label strip (above the panels) renders identically
        np.testing.assert_array_equal(fast[i][:44], ref[:44],
                                      err_msg=f"frame {i} caption strip")


def test_compose_panel_clip_matches_per_frame_path():
    """The generic vectorized composer (used by explain_local's video
    panels) is pixel-identical to composing each frame with
    compose_panel_frame — including the 2-panel no-colorbar layout."""
    import numpy as np

    from protoasnet_tpu.explain.render import (compose_panel_clip,
                                               compose_panel_frame,
                                               heatmap_clip, make_heatmap)

    rng = np.random.default_rng(7)
    t, h, w = 3, 40, 44
    img = rng.uniform(size=(t, h, w, 3)).astype(np.float32)
    up = rng.uniform(size=(t, h, w)).astype(np.float32)
    labels = ("input", "input overlay")
    fast = compose_panel_clip([img, 0.5 * img + 0.3 * heatmap_clip(up)],
                              "a title", labels=labels)
    for i in range(t):
        ref = compose_panel_frame(
            [img[i], 0.5 * img[i] + 0.3 * make_heatmap(up[i])],
            "a title", labels=labels)
        np.testing.assert_array_equal(fast[i], ref, err_msg=f"frame {i}")


def test_ensure_config_dump_self_describing_run_dir(tmp_path):
    """Library-API run dirs become servable: save_checkpoint dumps
    config_agent.yml once, respects an existing CLI dump, and never fails
    a save over a non-YAML-safe config."""
    from protoasnet_tpu.train.agents.base import BaseAgent

    a = BaseAgent.__new__(BaseAgent)  # no build: method under test only
    a.save_dir = str(tmp_path)
    a.config = {"agent": "X", "train": {"seed": 1}}
    a._ensure_config_dump()
    p = tmp_path / "config_agent.yml"
    assert p.exists()

    p.write_text("sentinel: 1\n")  # existing dump (CLI or prior save)
    a._ensure_config_dump()        # -> no-op, not overwritten
    assert p.read_text() == "sentinel: 1\n"

    b = BaseAgent.__new__(BaseAgent)
    b.save_dir = str(tmp_path / "bad")
    import os

    os.makedirs(b.save_dir)
    b.config = {"bad": object()}   # not YAML-safe
    b._ensure_config_dump()        # warns, must not raise
    assert not os.path.exists(os.path.join(b.save_dir, "config_agent.yml"))


def test_latest_push_pickle_sorts_epochs_numerically(tmp_path):
    """Regression: 'epoch-9_pushed' used to lexicographically beat
    'epoch-10_pushed', so explain rendered stale prototype evidence once
    training passed 9 epochs."""
    import pickle

    from protoasnet_tpu.explain.local import latest_push_pickle

    assert latest_push_pickle(str(tmp_path / "missing")) is None
    for name in ("epoch-2_pushed", "epoch-9_pushed", "epoch-10_pushed"):
        d = tmp_path / name
        d.mkdir()
        with open(d / "prototypes_info.pickle", "wb") as f:
            pickle.dump({"from": name}, f)
    # a non-push dir without the pickle must be skipped, not crash the scan
    (tmp_path / "notes").mkdir()
    got = latest_push_pickle(str(tmp_path))
    assert got is not None and "epoch-10_pushed" in got
