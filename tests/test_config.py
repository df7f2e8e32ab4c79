import pytest
import yaml

from protoasnet_tpu.utils.config import (
    apply_overrides,
    flatten_config,
    parse_prototype_shape,
    parse_value,
    updated_config,
)


def test_parse_value_types():
    assert parse_value("true") is True
    assert parse_value("False") is False
    assert parse_value("null") is None
    assert parse_value("3") == 3
    assert parse_value("0.0001") == 0.0001
    assert parse_value("hello") == "hello"
    assert parse_value("(40, 256, 1, 1, 1)") == (40, 256, 1, 1, 1)
    assert parse_value("[1, 2]") == [1, 2]


def test_apply_overrides_nested():
    cfg = {"train": {"optimizer": {"lr_same": 1e-4}}, "abstain_class": True}
    out = apply_overrides(cfg, ["--train.optimizer.lr_same=0.01", "--abstain_class=false"])
    assert out["train"]["optimizer"]["lr_same"] == 0.01
    assert out["abstain_class"] is False
    # original untouched
    assert cfg["train"]["optimizer"]["lr_same"] == 1e-4


def test_apply_overrides_unknown_key_raises():
    with pytest.raises(KeyError):
        apply_overrides({"a": {"b": 1}}, ["--a.zzz=3"])


def test_prototype_shape_parsing():
    assert parse_prototype_shape("(40, 256, 1, 1, 1)") == (40, 256, 1, 1, 1)
    assert parse_prototype_shape([30, 512, 1, 1]) == (30, 512, 1, 1)


def test_updated_config_roundtrip(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump({"agent": "XProtoNetE2E", "train": {"seed": 1}}))
    cfg = updated_config([f"--config_path={p}", "--train.seed=42", "--run_name=foo"])
    assert cfg["agent"] == "XProtoNetE2E"
    assert cfg["train"]["seed"] == 42
    assert cfg["run_name"] == "foo"
    assert cfg["eval_only"] is False


def test_flatten():
    flat = flatten_config({"a": {"b": {"c": 1}}, "d": 2})
    assert flat == {"a.b.c": 1, "d": 2}
