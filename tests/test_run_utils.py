import json
import os

import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.tracking.trackers import JsonlTracker
from protoasnet_tpu.utils.io import load_checkpoint, save_checkpoint
from protoasnet_tpu.utils.run import create_save_loc, enable_compilation_cache


def test_create_save_loc_increments_without_ckpt(tmp_path):
    cfg = {"save_dir": str(tmp_path), "run_name": "exp"}
    create_save_loc(cfg)
    first = cfg["save_dir"]
    assert first.endswith("exp")
    # dir exists without a checkpoint -> next run gets a suffix
    cfg2 = {"save_dir": str(tmp_path), "run_name": "exp"}
    create_save_loc(cfg2)
    assert cfg2["save_dir"].endswith("exp_1")


def test_create_save_loc_reuses_with_ckpt(tmp_path):
    cfg = {"save_dir": str(tmp_path), "run_name": "exp"}
    create_save_loc(cfg)
    open(os.path.join(cfg["save_dir"], "last.ckpt"), "wb").write(b"x")
    cfg2 = {"save_dir": str(tmp_path), "run_name": "exp"}
    create_save_loc(cfg2)
    assert cfg2["save_dir"] == cfg["save_dir"]  # resume the same dir


def test_checkpoint_io_roundtrip(tmp_path):
    state = {
        "epoch": 3,
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "best": 0.5,
    }
    path = str(tmp_path / "s.ckpt")
    save_checkpoint(state, path)
    restored = load_checkpoint(path, target={
        "epoch": 0, "params": {"w": jnp.zeros((2, 3))}, "best": 0.0})
    assert restored["epoch"] == 3
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    # raw restore without target
    raw = load_checkpoint(path)
    assert raw["epoch"] == 3


def test_jsonl_tracker(tmp_path):
    t = JsonlTracker(str(tmp_path))
    t.log({"a": 1.0, "b": jnp.float32(2.5), "name": "x"})
    t.log({"a": 2})
    t.finish()
    rows = [json.loads(line) for line in open(t.path)]
    assert rows[0]["a"] == 1.0 and rows[0]["b"] == 2.5 and rows[0]["name"] == "x"
    assert rows[1]["a"] == 2.0


def test_enable_compilation_cache(tmp_path, monkeypatch):
    import jax

    prior = jax.config.jax_compilation_cache_dir
    try:
        # explicit dir wins and is created
        target = str(tmp_path / "xla")
        monkeypatch.delenv("PROTOASNET_NO_COMPILE_CACHE", raising=False)
        assert enable_compilation_cache(cache_dir=target) == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
        # env var beats the ~/.cache default
        env_dir = str(tmp_path / "env_xla")
        monkeypatch.setenv("PROTOASNET_COMPILE_CACHE_DIR", env_dir)
        assert enable_compilation_cache() == env_dir
        # default dir is platform-scoped, and the CPU scope is
        # machine-keyed so entries can't migrate across the pool
        # (cpu_aot_loader poisoning; utils/run.py rationale)
        monkeypatch.delenv("PROTOASNET_COMPILE_CACHE_DIR", raising=False)
        monkeypatch.setenv("HOME", str(tmp_path))
        from protoasnet_tpu.utils.run import _machine_key
        got = enable_compilation_cache()
        assert got == str(tmp_path / ".cache" / "protoasnet_tpu" / "xla"
                          / f"cpu-{_machine_key()}")  # conftest pins cpu
        assert os.path.isdir(got)
        # opt-out returns None and leaves config untouched
        monkeypatch.setenv("PROTOASNET_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache(cache_dir=str(tmp_path / "no")) is None
        assert jax.config.jax_compilation_cache_dir == got
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)


def test_aggregate_predictions():
    import pandas as pd

    from protoasnet_tpu.train.aggregate import aggregate_predictions

    df = pd.DataFrame({
        "filename": ["a", "a", "b", "b", "b", "c"],
        "target_AS": [0, 0, 1, 1, 1, 2],
        "logit_No AS": [2.0, 1.5, 0.1, 0.0, 0.2, 0.0],
        "logit_Early AS": [0.1, 0.2, 1.9, 2.2, 1.5, 0.1],
        "logit_Significant AS": [0.0, 0.1, 0.0, 0.1, 0.3, 2.5],
        "logit_abstain": [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    })
    agg, metrics = aggregate_predictions(df, abstain_class=True)
    assert len(agg) == 3
    assert list(agg.sort_values("filename")["pred_AS"]) == [0, 1, 2]
    assert metrics["balanced_accuracy"] == 1.0
    assert metrics["n_videos"] == 3
    assert agg.loc[agg.filename == "b", "n_intervals"].item() == 3
