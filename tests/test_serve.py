"""Serving export roundtrip: serialized StableHLO artifact reproduces the
live model's logits at multiple batch sizes (symbolic batch dim)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protoasnet_tpu.models.builder import build_model, init_model
from protoasnet_tpu.serve import (
    export_inference,
    load_exported,
    load_serving_bundle,
    save_serving_bundle,
)


@pytest.fixture(scope="module")
def small_model():
    cfg = {"name": "XProtoNet", "base_architecture": "resnet18",
           "prototype_shape": (8, 64, 1, 1), "num_classes": 4, "img_size": 32}
    model = build_model(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    params, stats = init_model(model, x, seed=0)
    return model, params, stats


@pytest.fixture(scope="module")
def fwd(small_model):
    """Jitted reference forward (eager apply re-dispatches every op)."""
    model = small_model[0]
    return jax.jit(lambda v, x: model.apply(v, x, train=False)[0])


def test_export_roundtrip_multiple_batch_sizes(small_model, fwd):
    model, params, stats = small_model
    blob = export_inference(model, params, stats, (32, 32, 3))
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000
    fn = load_exported(bytes(blob))
    variables = {"params": params, "batch_stats": stats}
    rng = np.random.default_rng(0)
    for b in (1, 3, 5):
        x = jnp.asarray(rng.normal(size=(b, 32, 32, 3)), jnp.float32)
        got = np.asarray(fn(variables, x))
        want = np.asarray(fwd(variables, x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_serving_bundle_file(tmp_path, small_model, fwd):
    model, params, stats = small_model
    path = str(tmp_path / "model.bundle")
    save_serving_bundle(path, model, params, stats, (32, 32, 3))
    fn = load_serving_bundle(path)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    got = np.asarray(fn(x))
    want = np.asarray(fwd({"params": params, "batch_stats": stats}, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_serve_cli_predict(tmp_path, capsys, small_model, fwd):
    """python -m protoasnet_tpu.serve predict: bundle + .npy in, logits
    .npy out, chunked through a batch size smaller than the input."""
    from protoasnet_tpu.serve import main

    model, params, stats = small_model
    bundle = str(tmp_path / "m.bundle")
    save_serving_bundle(bundle, model, params, stats, (32, 32, 3))
    rng = np.random.default_rng(9)
    x = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    np.save(tmp_path / "x.npy", x)
    main(["predict", "--bundle", bundle, "--input", str(tmp_path / "x.npy"),
          "--out", str(tmp_path / "logits.npy"), "--batch", "2"])
    logits = np.load(tmp_path / "logits.npy")
    want = np.asarray(fwd({"params": params, "batch_stats": stats},
                          jnp.asarray(x)))
    np.testing.assert_allclose(logits, want, rtol=1e-5, atol=1e-5)
    assert "class" in capsys.readouterr().out


def test_serve_cli_tune(tmp_path, capsys, small_model):
    """python -m protoasnet_tpu.serve tune: sweeps candidate batches over
    the exported call (chained in one jitted fori_loop) and recommends a
    --max_batch. Functional check on CPU — rates are meaningless here,
    but the chaining must trace, every candidate must report, and the
    recommendation must be one of the surviving candidates."""
    import json as _json

    from protoasnet_tpu.serve import main

    model, params, stats = small_model
    bundle = str(tmp_path / "m.bundle")
    save_serving_bundle(bundle, model, params, stats, (32, 32, 3))
    main(["tune", "--bundle", bundle, "--batches", "2,4",
          "--points", "2", "10"])
    out = capsys.readouterr().out
    report = _json.loads(out.strip().splitlines()[-1])
    assert set(report["results"]) == {"2", "4"} or \
        set(report["results"]) == {2, 4}
    assert all("samples_per_sec" in r for r in report["results"].values())
    assert report["recommended_max_batch"] in (2, 4)
    assert "--max_batch" in out


def test_sharded_serving_matches_single_device(small_model, fwd):
    """Data-parallel serving over the 8-device mesh: same logits as the
    plain forward, batch and logits sharded over 'data', no collectives
    needed (per-sample independence)."""
    from protoasnet_tpu.parallel import batch_sharding, make_mesh
    from protoasnet_tpu.serve import make_sharded_serving_fn

    model, params, stats = small_model
    variables = {"params": params, "batch_stats": stats}
    mesh = make_mesh()
    assert mesh.devices.size == 8
    fn = make_sharded_serving_fn(model, mesh)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(16, 32, 32, 3)), jnp.float32)
    xs = jax.device_put(x, batch_sharding(mesh))
    got = fn(variables, xs)
    assert got.sharding.spec == batch_sharding(mesh).spec
    want = np.asarray(fwd(variables, x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
    # const-weights variant (the serve_live path, +30% measured on chip):
    # same logits, weights baked, fn takes only x
    fn_const = make_sharded_serving_fn(model, mesh, variables=variables)
    got_const = fn_const(xs)
    assert got_const.sharding.spec == batch_sharding(mesh).spec
    np.testing.assert_allclose(np.asarray(got_const), want,
                               rtol=2e-5, atol=2e-5)


def test_quantized_bundle_roundtrip(tmp_path, small_model):
    """int8 bundle: exported artifact == live quantized path exactly-ish,
    and stays a faithful approximation of the fp model."""
    from protoasnet_tpu.quant import (apply_quantized, build_qstate,
                                      calibrate_act_scales)

    model, params, stats = small_model
    variables = {"params": params, "batch_stats": stats}
    rng = np.random.default_rng(2)
    calib = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    scales = calibrate_act_scales(model, variables, [calib])
    assert scales and all(p.split("/")[0] == "cnn_backbone" for p in scales)
    qstate = build_qstate(variables, scales)

    path = str(tmp_path / "model_int8.bundle")
    save_serving_bundle(path, model, params, stats, (32, 32, 3),
                        qstate=qstate)
    fn = load_serving_bundle(path)
    x = jnp.asarray(rng.normal(size=(3, 32, 32, 3)), jnp.float32)
    got = np.asarray(fn(x))
    live = np.asarray(jax.jit(
        lambda v, q, xx: apply_quantized(model, v, q, xx))(
            variables, qstate, x)[0])
    np.testing.assert_allclose(got, live, rtol=1e-5, atol=1e-5)


def test_uint8_gray_bundle_matches_manual_transform(tmp_path, small_model,
                                                    fwd):
    """uint8_gray bundle: raw grayscale uint8 in, on-device /255 + echo
    normalize + gray->3ch broadcast (the eval-loader math,
    data/transforms.py) baked into the artifact; logits match running the
    transform by hand then the float32 forward."""
    from protoasnet_tpu.data.transforms import normalize
    from protoasnet_tpu.serve import bundle_input_spec

    model, params, stats = small_model
    path = str(tmp_path / "model_u8.bundle")
    save_serving_bundle(path, model, params, stats, (32, 32, 3),
                        uint8_gray=True)
    shape, dtype = bundle_input_spec(path)
    assert shape == (None, 32, 32) and dtype == np.uint8

    fn = load_serving_bundle(path)
    rng = np.random.default_rng(7)
    xu8 = rng.integers(0, 256, size=(3, 32, 32), dtype=np.uint8)
    got = np.asarray(fn(xu8), np.float32)

    xf = normalize(jnp.asarray(xu8, jnp.float32) / 255.0)
    xf = jnp.broadcast_to(xf[..., None], xf.shape + (3,))
    want = np.asarray(fwd({"params": params, "batch_stats": stats}, xf))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_predict_cli_rejects_float_input_for_uint8_bundle(tmp_path,
                                                          small_model):
    """`serve predict` must refuse an unsafe dtype cast: float clips fed
    to a --uint8_input bundle would truncate [0,1] floats to all-zeros and
    print confident garbage. (Daemon-side, server._validate rejects the
    same thing with a 400.)"""
    from protoasnet_tpu.serve import main as serve_main

    model, params, stats = small_model
    bundle = str(tmp_path / "model_u8.bundle")
    save_serving_bundle(bundle, model, params, stats, (32, 32, 3),
                        uint8_gray=True)
    bad = str(tmp_path / "x.npy")
    np.save(bad, np.random.default_rng(0).normal(
        size=(2, 32, 32)).astype(np.float32))
    with pytest.raises(SystemExit, match="not safely castable"):
        serve_main(["predict", "--bundle", bundle, "--input", bad,
                    "--batch", "2"])
    # the intended raw uint8 input still round-trips
    ok = str(tmp_path / "x_u8.npy")
    np.save(ok, np.random.default_rng(1).integers(
        0, 256, size=(2, 32, 32), dtype=np.uint8))
    serve_main(["predict", "--bundle", bundle, "--input", ok,
                "--batch", "2"])


def test_uint8_gray_plus_int8_bundle(tmp_path, small_model):
    """BOTH export flags together (`serve export --uint8_input --int8`,
    the minimal-wire + fastest-compute deployment): raw uint8 frames in,
    on-device eval transform, int8 backbone — logits match running the
    transform by hand through the live quantized path."""
    from protoasnet_tpu.data.transforms import normalize
    from protoasnet_tpu.quant import (apply_quantized, build_qstate,
                                      calibrate_act_scales)
    from protoasnet_tpu.serve import bundle_input_spec

    model, params, stats = small_model
    variables = {"params": params, "batch_stats": stats}
    rng = np.random.default_rng(11)
    calib = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    qstate = build_qstate(
        variables, calibrate_act_scales(model, variables, [calib]))

    path = str(tmp_path / "model_u8_int8.bundle")
    save_serving_bundle(path, model, params, stats, (32, 32, 3),
                        qstate=qstate, uint8_gray=True)
    shape, dtype = bundle_input_spec(path)
    assert shape == (None, 32, 32) and dtype == np.uint8

    fn = load_serving_bundle(path)
    xu8 = rng.integers(0, 256, size=(3, 32, 32), dtype=np.uint8)
    got = np.asarray(fn(xu8), np.float32)

    xf = normalize(jnp.asarray(xu8, jnp.float32) / 255.0)
    xf = jnp.broadcast_to(xf[..., None], xf.shape + (3,))
    want = np.asarray(jax.jit(
        lambda v, q, xx: apply_quantized(model, v, q, xx))(
            variables, qstate, xf)[0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
