"""Tracker backends: JSONL roundtrip + wandb path via a stub module.

wandb is not installed in this environment, so the WandbTracker path is
exercised against a monkeypatched stub that records the init / metric
definition / log / finish calls the reference makes (base.py:62-88).
"""

import json
import sys
import types

from protoasnet_tpu.tracking.trackers import (
    JsonlTracker,
    WandbTracker,
    make_tracker,
)


def test_jsonl_tracker_roundtrip(tmp_path):
    tr = make_tracker({"wandb_mode": "disabled", "save_dir": str(tmp_path)})
    assert isinstance(tr, JsonlTracker)
    tr.log({"batch_train/loss_all": 1.5, "batch_train/step": 3,
            "note": "text"})
    tr.log({"epoch/val/f1_mean": 0.75})
    tr.finish()
    rows = [json.loads(line)
            for line in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["batch_train/loss_all"] == 1.5
    assert rows[0]["note"] == "text"
    assert rows[1]["epoch/val/f1_mean"] == 0.75
    assert all("_t" in r for r in rows)


def _stub_wandb(calls):
    stub = types.ModuleType("wandb")

    def record(name):
        def f(*a, **k):
            calls.append((name, a, k))
        return f

    stub.init = record("init")
    stub.define_metric = record("define_metric")
    stub.log = record("log")
    stub.finish = record("finish")
    return stub


def test_wandb_tracker_with_stub(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setitem(sys.modules, "wandb", _stub_wandb(calls))

    cfg = {"wandb_mode": "online", "save_dir": str(tmp_path),
           "run_name": "smoke", "model": {"name": "XProtoNet"}}
    tr = make_tracker(cfg)
    assert isinstance(tr, WandbTracker)

    init = [c for c in calls if c[0] == "init"]
    assert len(init) == 1
    assert init[0][2]["name"] == "smoke"
    assert init[0][2]["mode"] == "online"
    assert init[0][2]["config"] is cfg
    # reference metric-definition surface: per-mode batch step axes +
    # epoch summaries (base.py:62-88)
    defined = [c[1][0] for c in calls if c[0] == "define_metric"]
    for m in ("train", "val", "val_push", "test"):
        assert f"batch_{m}/step" in defined
        assert f"batch_{m}/*" in defined
        assert f"epoch/{m}/f1_mean" in defined
        assert f"epoch/{m}/AUC_mean" in defined
        assert f"epoch/{m}/loss_all" in defined

    tr.log({"batch_train/loss_all": 0.5})
    tr.finish()
    assert ("log", ({"batch_train/loss_all": 0.5},), {}) in calls
    assert any(c[0] == "finish" for c in calls)


def test_wandb_fallback_without_package(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    tr = make_tracker({"wandb_mode": "online", "save_dir": str(tmp_path)})
    assert isinstance(tr, JsonlTracker)
