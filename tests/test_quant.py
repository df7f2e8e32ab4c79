"""w8a8 post-training quantization (protoasnet_tpu/quant.py).

Pins: (a) exact golden math on a single conv, (b) empty-qstate identity,
(c) end-to-end logit fidelity on a briefly-trained tiny flagship model,
(d) only backbone convs quantize under the default filter.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protoasnet_tpu.models.builder import build_model, init_model
from protoasnet_tpu.quant import (apply_quantized, build_qstate,
                                  calibrate_act_scales)


def test_single_conv_golden_math():
    """Quantized conv == manual quantize -> int conv -> dequant, exactly."""
    conv = nn.Conv(5, (3, 3), padding="SAME", use_bias=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    variables = conv.init(jax.random.PRNGKey(0), x)

    scales = calibrate_act_scales(conv, variables, [x],
                                  path_filter=lambda p: True,
                                  pass_train=False)
    assert set(scales) == {""}
    np.testing.assert_allclose(float(scales[""]),
                               float(jnp.max(jnp.abs(x))) / 127.0, rtol=1e-6)

    qstate = build_qstate(variables, scales)
    got = apply_quantized(conv, variables, qstate, x, pass_train=False)

    w = np.asarray(variables["params"]["kernel"], np.float64)
    w_scale = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-8) / 127.0
    w_q = np.clip(np.round(w / w_scale), -127, 127)
    a_scale = float(scales[""])
    x_q = np.clip(np.round(np.asarray(x, np.float64) / a_scale), -127, 127)
    acc = jax.lax.conv_general_dilated(
        jnp.asarray(x_q, jnp.float32), jnp.asarray(w_q, jnp.float32),
        (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")))
    want = (np.asarray(acc, np.float64) * (a_scale * w_scale)
            + np.asarray(variables["params"]["bias"], np.float64))
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=1e-5, atol=1e-5)
    # and it's a faithful approximation of the fp conv
    fp = conv.apply(variables, x)
    assert float(jnp.max(jnp.abs(fp - got))) < 0.05 * float(
        jnp.max(jnp.abs(fp)))


@pytest.fixture(scope="module")
def tiny_trained():
    """A tiny flagship model trained a few steps so logits are non-trivial."""
    from protoasnet_tpu.losses.bundle import LossBundle
    from protoasnet_tpu.train.optim import make_adam
    from protoasnet_tpu.train.steps import TrainState, make_xprotonet_steps

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (8, 64, 1, 1, 1),
           "num_classes": 4, "img_size": 32}
    model = build_model(cfg)
    x0 = jnp.zeros((2, 8, 32, 32, 3))
    params, batch_stats = init_model(model, x0, seed=0)
    criterion = {"CeLossAbstain": {"loss_weight": 1, "ab_weight": 0.3,
                                   "ab_logitpath": "joined",
                                   "reduction": "mean"},
                 "ClusterRoiFeat": {"loss_weight": 0.8, "reduction": "mean"}}
    bundle = LossBundle(criterion, num_classes=4, abstain_class=True)
    groups = ("backbone", "add_on", "occurrence", "last_layer")
    tx = make_adam(weight_decay_by_group={g: 1e-3 for g in groups},
                   params=params)
    state = TrainState.create(params, batch_stats, tx)
    train_step, _, _ = make_xprotonet_steps(model, bundle, tx,
                                            accumulation_steps=1,
                                            stage="all", donate=False)
    lrs = {g: jnp.float32(3e-3) for g in
           ("backbone", "add_on", "occurrence", "prototypes", "last_layer")}
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    # ~2.7 s/step on this host; 4 steps keeps logits non-trivial while
    # staying inside the fast-suite budget (fidelity margins re-measured
    # at 4 steps: rel 0.0024, cos 1.0000, ranking 1.0 — far inside the
    # 0.08 / 0.995 / 0.75 thresholds)
    for _ in range(4):
        xb = rng.uniform(-0.5, 2.0, size=(4, 8, 32, 32, 3)).astype(np.float32)
        yb = rng.integers(0, 3, size=4).astype(np.int32)
        xb += yb[:, None, None, None, None] * 0.5
        key, sub = jax.random.split(key)
        state, _ = train_step(state, jnp.asarray(xb), jnp.asarray(yb),
                              jnp.ones(4, jnp.bool_), sub, lrs)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batches = []
    for _ in range(2):
        xb = rng.uniform(-0.5, 2.0, size=(4, 8, 32, 32, 3)).astype(np.float32)
        xb += rng.integers(0, 3, size=4)[:, None, None, None, None] * 0.5
        batches.append(jnp.asarray(xb))
    return model, variables, batches


@pytest.fixture(scope="module")
def calibrated(tiny_trained):
    """Shared calibration + fp reference forward (one compile each for the
    whole module — the suite's quant cost is dominated by model compiles)."""
    model, variables, batches = tiny_trained
    scales = calibrate_act_scales(model, variables, batches)
    fp = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, batches[1])[0], np.float64)
    return scales, fp


@pytest.fixture(scope="module")
def q_apply(tiny_trained):
    """Jitted apply_quantized (eager would re-dispatch every op)."""
    model = tiny_trained[0]
    return jax.jit(lambda v, q, x: apply_quantized(model, v, q, x))


def test_default_filter_quantizes_only_backbone(calibrated):
    scales, _ = calibrated
    assert len(scales) > 20  # 27 convs in the truncated R(2+1)D trunk
    assert all(p.split("/")[0] == "cnn_backbone" for p in scales)
    # the custom space-to-depth stem conv is not an nn.Conv: never quantized
    assert not any("stem_spatial" in p for p in scales)


def test_empty_qstate_is_identity(tiny_trained, calibrated, q_apply):
    model, variables, batches = tiny_trained
    _, fp = calibrated
    got = q_apply(variables, {}, batches[1])[0]
    np.testing.assert_array_equal(fp.astype(np.float32),
                                  np.asarray(got))


def test_quantized_logits_faithful(tiny_trained, calibrated, q_apply):
    """End-to-end fidelity of the default (unfolded — the measured serving
    winner, see build_qstate) qstate on a trained tiny flagship."""
    model, variables, batches = tiny_trained
    scales, fp = calibrated
    qstate = build_qstate(variables, scales)
    assert not any("fold_m" in q for q in qstate.values())  # default OFF
    # the opt-in fold finds every spatial/temporal pair (structure only —
    # the fold math itself is pinned by test_conv2plus1d_fold_golden)
    folded = build_qstate(variables, scales, fold_conv2plus1d=True,
                          fold_min_channels=0)
    assert sum("fold_m" in q for q in folded.values()) >= 8
    assert all(("fold_m" in q) == p.endswith("/spatial")
               for p, q in folded.items())
    q = np.asarray(q_apply(variables, qstate, batches[1])[0], np.float64)
    denom = np.abs(fp).max() + 1e-9
    rel = np.abs(fp - q).max() / denom
    cos = (fp * q).sum() / (np.linalg.norm(fp) * np.linalg.norm(q) + 1e-12)
    assert rel < 0.08, (rel, fp[0], q[0])
    assert cos > 0.995, cos
    # ranking preserved per sample
    assert (fp.argmax(axis=1) == q.argmax(axis=1)).mean() >= 0.75


def test_conv2plus1d_fold_golden():
    """The folded int8-resident pair == quantize(relu(bn(spatial(x))))
    fed to the quantized temporal conv, exactly — the fold_m/fold_b
    epilogue must reproduce the unfolded composition's integer codes."""
    from protoasnet_tpu.models.norm import BatchNorm
    from protoasnet_tpu.quant import path_key

    class Pair(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(6, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                        use_bias=False, name="spatial")(x)
            x = BatchNorm(use_running_average=not train, name="bn_mid")(x)
            x = nn.relu(x)
            x = nn.Conv(8, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                        use_bias=False, name="temporal")(x)
            return x

    rng = np.random.default_rng(5)
    m = Pair()
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 6, 3)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(1), x, train=False)
    # non-trivial eval stats so the BN fold actually does something
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    variables["batch_stats"]["bn_mid"]["mean"] = jnp.asarray(
        rng.normal(size=6) * 0.3, jnp.float32)
    variables["batch_stats"]["bn_mid"]["var"] = jnp.asarray(
        rng.uniform(0.5, 2.0, size=6), jnp.float32)
    variables["params"]["bn_mid"]["scale"] = jnp.asarray(
        rng.uniform(0.5, 1.5, size=6), jnp.float32)
    variables["params"]["bn_mid"]["bias"] = jnp.asarray(
        rng.normal(size=6) * 0.2, jnp.float32)

    scales = calibrate_act_scales(m, variables, [x],
                                  path_filter=lambda p: True)
    qstate = build_qstate(variables, scales, fold_conv2plus1d=True,
                          fold_min_channels=0)
    assert "fold_m" in qstate["spatial"] and "fold_m" not in qstate["temporal"]
    got = np.asarray(apply_quantized(m, variables, qstate, x), np.float64)

    # manual unfolded composition at f64: int8 spatial conv -> dequant ->
    # BN -> ReLU -> quantize by the temporal a_scale -> int8 temporal conv
    qs, qt = qstate["spatial"], qstate["temporal"]
    dn = jax.lax.conv_dimension_numbers(x.shape, qs["w_q"].shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    xq = jnp.clip(jnp.round(x / qs["a_scale"]), -127, 127)
    acc = jax.lax.conv_general_dilated(
        xq.astype(jnp.float32), np.asarray(qs["w_q"], np.float32), (1, 1, 1),
        ((0, 0), (1, 1), (1, 1)), dimension_numbers=dn)
    y = np.asarray(acc, np.float64) * np.asarray(
        qs["a_scale"] * qs["w_scale"], np.float64)
    bs, bp = variables["batch_stats"]["bn_mid"], variables["params"]["bn_mid"]
    y = (y - np.asarray(bs["mean"], np.float64)) / np.sqrt(
        np.asarray(bs["var"], np.float64) + 1e-5)
    y = y * np.asarray(bp["scale"], np.float64) + np.asarray(
        bp["bias"], np.float64)
    y8 = np.clip(np.round(np.maximum(y, 0.0)
                          / float(qt["a_scale"])), 0, 127)
    dn2 = jax.lax.conv_dimension_numbers(y8.shape, qt["w_q"].shape,
                                         ("NDHWC", "DHWIO", "NDHWC"))
    acc2 = jax.lax.conv_general_dilated(
        jnp.asarray(y8, jnp.float32), np.asarray(qt["w_q"], np.float32),
        (1, 1, 1), ((1, 1), (0, 0), (0, 0)), dimension_numbers=dn2)
    want = np.asarray(acc2, np.float64) * np.asarray(
        qt["a_scale"] * qt["w_scale"], np.float64)
    # identical integer codes modulo f32-vs-f64 epilogue rounding at the
    # .5 boundaries: allow <=1 code step through the second conv's kernel
    step = np.abs(np.asarray(qt["w_q"], np.float64)).sum() * float(
        qt["a_scale"] * qt["w_scale"].max())
    np.testing.assert_allclose(got, want, atol=step * 0.02 + 1e-6)
    # and the whole thing approximates the fp pair
    fp = np.asarray(m.apply(variables, x, train=False), np.float64)
    assert np.abs(fp - got).max() < 0.1 * np.abs(fp).max()
