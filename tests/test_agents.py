"""Agent-level integration: tiny end-to-end train/push/eval on the
synthetic fixture (the reference's de-facto integration test is its deploy
script; this is the hermetic equivalent, SURVEY.md §4)."""

import os

import numpy as np
import pytest

from protoasnet_tpu.train.agents import build_agent

pytestmark = pytest.mark.slow


def _video_config(csv, tmp):
    return {
        "agent": "Video_XProtoNet_e2e",
        "abstain_class": True,
        "wandb_mode": "disabled",
        "run_name": "t",
        "save_dir": str(tmp),
        "render_prototypes": False,
        "model": {
            "checkpoint_path": "",
            "name": "Video_XProtoNet",
            "base_architecture": "resnet2p1d_18",
            "backbone_last_layer_num": -3,
            "prototype_shape": "(8, 32, 1, 1, 1)",
            "num_classes": 4,
        },
        "train": {
            "seed": 1,
            "num_train_epochs": 1,
            "save": True,
            "save_step": None,
            "num_warm_epochs": 0,
            "batch_size": 3,
            "accumulation_steps": 2,
            "push_start": 0,
            "push_rate": 1,
            "criterion": {
                "CeLossAbstain": {"loss_weight": 1, "ab_weight": 0.3,
                                  "ab_logitpath": "joined", "reduction": "mean"},
                "ClusterRoiFeat": {"loss_weight": 0.8, "reduction": "mean"},
                "SeparationRoiFeat": {"loss_weight": 0.08, "reduction": "mean"},
                "OrthogonalityLoss": {"loss_weight": 0.0, "mode": "per_class"},
                "Lnorm_occurrence": {"p": 2, "loss_weight": 0.0,
                                     "reduction": "mean"},
                "trans_occurrence": {"loss_weight": 0.001, "reduction": "mean"},
                "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
            },
            "optimizer": {"name": "Adam", "mode": "lr_same", "lr_same": 1e-4},
            "lr_schedule": {"name": "ReduceLROnPlateau", "mode": "max",
                            "factor": 0.5, "patience": 2, "threshold": 1e-4,
                            "cooldown": 0, "min_lr": 1e-6},
        },
        "data": {
            "data_info_file": csv,
            "sample_size": None,
            "sampler": "AS",
            "view": "all",
            "augmentation": True,
            "transform_rotate_degrees": 10,
            "transform_min_crop_ratio": 0.7,
            "transform_time_dilation": 0.2,
            "normalize": True,
            "img_size": 32,
            "frames": 8,
            "iterate_intervals": True,
            "interval_unit": "cycle",
            "interval_quant": 1.0,
        },
    }


@pytest.fixture(scope="module")
def trained_agent(synthetic_csv, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("agent_run")
    agent = build_agent(_video_config(synthetic_csv, tmp))
    agent.train()
    return agent


def test_train_runs_and_checkpoints(trained_agent):
    agent = trained_agent
    assert os.path.exists(os.path.join(agent.save_dir, "last.ckpt"))
    # push ran at epoch 0 -> prototypes_info.pickle exists
    img_dir = os.path.join(agent.save_dir, "img")
    pickles = [os.path.join(r, f) for r, _, fs in os.walk(img_dir)
               for f in fs if f == "prototypes_info.pickle"]
    assert pickles, "push must emit prototypes_info.pickle"


def test_eval_and_csv(trained_agent):
    agent = trained_agent
    accu, f1, auc = agent.evaluate(mode="test")
    assert 0 <= accu <= 1 and 0 <= f1 <= 1
    csvs = os.listdir(os.path.join(agent.save_dir, "csv_test"))
    assert csvs


def test_push_projects_prototypes_onto_roi_features(trained_agent):
    agent = trained_agent
    # train() already ran a replacing push (push_start=0); a second push
    # must be idempotent (same winners -> same vectors)...
    before = np.asarray(agent.params["prototype_vectors"]).copy()
    agent.push(replace_prototypes=True)
    after = np.asarray(agent.params["prototype_vectors"])
    np.testing.assert_allclose(before, after, atol=1e-5)
    # ...and every projected prototype must sit ON some training ROI
    # feature: best 1-cos01 distance over the push set ~ 0
    loader = agent.data_loaders["train_push"]
    best = np.full(agent.model.num_prototypes, np.inf)
    for batch in loader:
        _, dist, _, _ = agent.push_step(agent.params, agent.batch_stats,
                                        batch["cine"])
        d = np.asarray(dist)[np.asarray(batch["valid"])]
        best = np.minimum(best, d.min(axis=0))
    assert best.max() < 1e-3, f"projected prototypes should hit dist~0, got {best}"


def test_checkpoint_roundtrip(trained_agent, synthetic_csv, tmp_path):
    agent = trained_agent
    cfg = _video_config(synthetic_csv, tmp_path)
    cfg["model"]["checkpoint_path"] = os.path.join(agent.save_dir, "last.ckpt")
    agent2 = build_agent(cfg)
    a = np.asarray(agent.params["prototype_vectors"])
    b = np.asarray(agent2.params["prototype_vectors"])
    # agent pushed after last.ckpt was written, so compare backbone params
    l1 = np.asarray(
        next(iter(agent2.params["last_layer"].values()))["kernel"])
    assert l1.shape == (8, 4)
    assert agent2.current_epoch == agent.current_epoch


def test_explain_local_renders(trained_agent):
    """explain_local end-to-end on the trained agent (1 sample, 1 proto)."""
    from protoasnet_tpu.explain.local import explain_local

    agent = trained_agent
    agent.config["explain_separate_overlays"] = True
    explain_local(agent, mode="test", top_k=1, max_samples=1)
    out = os.path.join(agent.save_dir, "explain_test")
    files = os.listdir(out)
    assert "model_products.pickle" in files
    assert any(f.startswith("0000_rank0") for f in files)
    assert os.path.isdir(os.path.join(out, "input_overlaid"))


def test_get_sim_scores_roundtrip(trained_agent):
    agent = trained_agent
    agent.get_sim_scores(mode="val")
    sims, targets = agent.load_sim_scores(agent.current_epoch, "val")
    assert sims.ndim == 2 and sims.shape[1] == agent.model.num_prototypes
    assert len(sims) == len(targets)


def test_on_device_metrics_matches_host(synthetic_csv, tmp_path):
    """train.on_device_metrics accumulates on device with one host sync;
    epoch metrics must match the per-batch host path."""
    cfg_h = _video_config(synthetic_csv, tmp_path / "host")
    cfg_h["train"]["num_train_epochs"] = 0  # eval only
    cfg_h["train"]["on_device_metrics"] = False  # host path (default is on)
    agent_h = build_agent(cfg_h)
    res_host = agent_h.run_epoch(0, mode="val")

    cfg_d = _video_config(synthetic_csv, tmp_path / "dev")
    cfg_d["train"]["num_train_epochs"] = 0
    cfg_d["train"]["on_device_metrics"] = True
    cfg_d["train"]["seed"] = cfg_h["train"]["seed"]
    agent_d = build_agent(cfg_d)
    res_dev = agent_d.run_epoch(0, mode="val")

    # same init (same seed) and deterministic eval loader -> same metrics
    np.testing.assert_allclose(res_host, res_dev, rtol=1e-5, atol=1e-6)


def test_training_is_deterministic(synthetic_csv, tmp_path):
    """Same seed + same data -> bitwise-identical trained params (explicit
    PRNG discipline; no hidden global state)."""
    import jax

    def train_once(sub):
        cfg = _video_config(synthetic_csv, tmp_path / sub)
        cfg["train"]["push_start"] = 99  # pure SGD epoch, no push
        agent = build_agent(cfg)
        agent.train()
        return agent.params

    p1 = train_once("a")
    p2 = train_once("b")
    for (k1, l1), (k2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(p1),
        jax.tree_util.tree_leaves_with_path(p2),
    ):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2),
                                      err_msg=str(k1))


def test_serve_live_daemon_over_trained_run(trained_agent):
    """The full deployment CLI path over a REAL trained run dir: serve_live
    rebuilds the agent, calibrates w8a8 via quant.calibrate_qstate_from_agent,
    serves data-parallel over the 8-device CPU mesh, and answers a
    concurrent HTTP client with per-sample logits. Covers the --run_dir
    --int8 plumbing that unit tests (mesh parity, batcher) don't — plus the
    --allow_reload hot-swap: POST /v1/reload re-loads the run as bf16
    (int8:false), background-compiles the const-bound sharded executables,
    and atomically swaps without the daemon ever going down."""
    import io
    import json
    import threading
    import time
    import urllib.request

    import glob

    from protoasnet_tpu.server import serve_live

    # The run dir must be self-describing even though the fixture used the
    # library API, not the CLI: save_checkpoint dumps config_agent.yml
    # (BaseAgent._ensure_config_dump) and serve_live rebuilds from it.
    assert glob.glob(os.path.join(trained_agent.save_dir, "config_*.yml"))

    ready, stop = threading.Event(), threading.Event()
    t = threading.Thread(
        target=serve_live,
        kwargs=dict(run_dir=str(trained_agent.save_dir), host="127.0.0.1",
                    port=0, max_batch=8, warmup=False, ready_event=ready,
                    int8=True, calib_batches=1, stop_event=stop,
                    allow_reload=True),
        daemon=True)
    t.start()
    try:
        assert ready.wait(600), "daemon never came up"
        base = f"http://127.0.0.1:{ready.port}"
        url = base + "/v1/predict"

        def predict(x):
            buf = io.BytesIO()
            np.save(buf, x)
            req = urllib.request.Request(url, data=buf.getvalue(),
                                         method="POST")
            with urllib.request.urlopen(req, timeout=600) as r:
                return np.load(io.BytesIO(r.read()), allow_pickle=False)

        x = np.random.default_rng(0).normal(
            size=(2, 8, 32, 32, 3)).astype(np.float32)
        out = predict(x)
        assert out.shape == (2, trained_agent.model.num_classes)
        assert np.all(np.isfinite(out))

        # hot-swap: same run dir re-loaded as bf16 (int8:false) — exercises
        # load_trained_agent + build_sharded + per-bucket AOT compile on the
        # reloader thread, then the atomic swap, all with the daemon up
        body = json.dumps({"target": str(trained_agent.save_dir),
                           "int8": False}).encode()
        req = urllib.request.Request(base + "/v1/reload", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 202
        deadline = time.time() + 600
        st = None
        while time.time() < deadline:
            with urllib.request.urlopen(base + "/v1/reload", timeout=60) as r:
                st = json.loads(r.read())
            if st["state"] in ("serving", "error"):
                break
            time.sleep(0.5)
        assert st and st["state"] == "serving" and st["generation"] == 1, st
        out2 = predict(x)  # now served by the bf16 executables
        assert out2.shape == out.shape and np.all(np.isfinite(out2))
    finally:
        stop.set()
        t.join(timeout=30)
    assert not t.is_alive()
