"""Direct tests for the analytic FLOPs counter (utils/flops.py).

This module is the denominator of every MFU number in BENCH_r*.json /
BENCH_DETAIL.json (VERDICT r3 weak #1: MFU is the drift-immune perf
figure). A silent counting bug would mis-state every perf claim, so it
gets: exact hand-computed goldens per primitive, an XLA cost-analysis
cross-check on the flagship op mix, and pinned per-clip goldens for the
two flagship traces bench.py counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protoasnet_tpu.utils.flops import PEAK_FLOPS, count_flops, mfu


# ---------------------------------------------------------------- exact


def test_matmul_exact():
    a = np.zeros((8, 64), np.float32)
    b = np.zeros((64, 32), np.float32)
    assert count_flops(lambda x, y: x @ y, a, b) == 2 * 8 * 64 * 32


def test_batched_dot_general_exact():
    a = np.zeros((4, 8, 16), np.float32)
    b = np.zeros((4, 16, 32), np.float32)
    got = count_flops(lambda x, y: jnp.einsum("bij,bjk->bik", x, y), a, b)
    assert got == 2 * 4 * 8 * 32 * 16


def test_conv2d_same_exact():
    x = np.zeros((2, 16, 16, 3), np.float32)
    w = np.zeros((3, 3, 3, 8), np.float32)
    got = count_flops(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x, w)
    assert got == 2 * (2 * 16 * 16 * 8) * 3 * 9


def test_conv2d_strided_valid_exact():
    x = np.zeros((1, 17, 17, 4), np.float32)
    w = np.zeros((3, 3, 4, 6), np.float32)
    got = count_flops(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x, w)
    # VALID 17x17 stride 2 kernel 3 -> 8x8 output
    assert got == 2 * (1 * 8 * 8 * 6) * 4 * 9


def test_depthwise_conv_groups_exact():
    # feature_group_count=4: kernel input-feature dim is per-group (1).
    x = np.zeros((1, 8, 8, 4), np.float32)
    w = np.zeros((3, 3, 1, 4), np.float32)
    got = count_flops(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=4,
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x, w)
    assert got == 2 * (1 * 8 * 8 * 4) * 1 * 9


def test_conv3d_exact():
    x = np.zeros((1, 4, 8, 8, 2), np.float32)
    w = np.zeros((3, 3, 3, 2, 5), np.float32)
    got = count_flops(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), x, w)
    assert got == 2 * (1 * 4 * 8 * 8 * 5) * 2 * 27


# ------------------------------------------------------- control flow


def test_scan_multiplies_by_length():
    a = np.zeros((8, 8), np.float32)

    def step(c, _):
        return c @ a, None

    got = count_flops(
        lambda x: jax.lax.scan(step, x, None, length=7)[0], a)
    assert got == 7 * 2 * 8 * 8 * 8


def test_cond_takes_max_branch():
    a = np.zeros((8, 8), np.float32)
    big = np.zeros((16, 16), np.float32)

    def f(x, y):
        return jax.lax.cond(
            True,
            lambda: (x @ x).sum() + (y @ y).sum(),  # both matmuls
            lambda: (x @ x).sum(),                  # one
        )

    got = count_flops(f, a, big)
    assert got == 2 * 8**3 + 2 * 16**3  # max branch, counted once


def test_recurses_into_jit_and_remat():
    a = np.zeros((8, 8), np.float32)
    inner = jax.jit(lambda x: x @ x)
    assert count_flops(inner, a) == 2 * 8**3
    rem = jax.checkpoint(lambda x: x @ x)
    assert count_flops(rem, a) == 2 * 8**3


def test_grad_counts_backward_matmuls():
    # d/dx sum(x@y) and d/dy both appear: fwd 2MNK + two bwd matmuls.
    a = np.zeros((8, 16), np.float32)
    b = np.zeros((16, 8), np.float32)
    f = lambda x, y: (x @ y).sum()  # noqa: E731
    got = count_flops(jax.grad(f, argnums=(0, 1)), a, b)
    # bwd: g@y^T (8x16x8) and x^T@g (16x8x8); XLA may elide the unused fwd
    # matmul at trace level it is still present in the jaxpr.
    assert got >= 2 * (2 * 8 * 16 * 8)
    assert got <= 3 * (2 * 8 * 16 * 8)


# ------------------------------------------------------------- mfu math


def test_mfu_arithmetic():
    assert mfu(1e12, 100.0, "bf16") == pytest.approx(1e14 / PEAK_FLOPS["bf16"])
    assert PEAK_FLOPS["int8"] == 2 * PEAK_FLOPS["bf16"]


# --------------------------------------------- flagship denominators


def _shaped_variables(model, x_shape):
    """Parameter pytree of zeros via eval_shape — no init compute."""
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros(x_shape, jnp.float32), train=False))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def test_flagship_video_fwd_flops_pinned():
    """Pin the bench.py fwd denominator: a silent model change that alters
    per-clip FLOPs must fail loudly, not silently shift every MFU claim.

    Value cross-checked against BENCH_DETAIL.json flops_per_clip_fwd."""
    from protoasnet_tpu.models.builder import build_model

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3,
           "prototype_shape": (40, 256, 1, 1, 1),
           "num_classes": 4, "img_size": 112, "dtype": "bfloat16"}
    model = build_model(cfg)
    x_shape = (1, 32, 112, 112, 3)
    variables = _shaped_variables(model, x_shape)
    got = count_flops(
        lambda v, xc: model.apply(v, xc, train=False)[0],
        variables, jnp.zeros(x_shape, jnp.float32))
    assert got == 156_565_176_640.0


def test_flagship_image_fwd_flops_in_range():
    from protoasnet_tpu.models.builder import build_model

    cfg = {"name": "XProtoNet", "base_architecture": "resnet18",
           "prototype_shape": (40, 512, 1, 1), "num_classes": 4,
           "img_size": 224, "dtype": "bfloat16"}
    model = build_model(cfg)
    x_shape = (1, 224, 224, 3)
    variables = _shaped_variables(model, x_shape)
    got = count_flops(
        lambda v, xc: model.apply(v, xc, train=False)[0],
        variables, jnp.zeros(x_shape, jnp.float32))
    # resnet18@224 backbone is ~3.6 GFLOP; add-ons/occurrence head adds
    # ~25% on the 512-channel 7x7 map. Bound it rather than over-pin.
    assert 3.6e9 < got < 6.0e9


def test_xla_cost_analysis_crosscheck():
    """The jaxpr walk vs XLA's own HLO cost analysis on the flagship op
    mix (conv2+1d backbone + 1x1x1 head + cosine layer), small shapes.

    Convention difference (measured, tests/test_flops.py history): XLA's
    HloCostAnalysis EXCLUDES the padded-window MAC positions of SAME
    convs, while the analytic count (like fvcore/torchprofile) charges
    the full kernel window per output — the standard model-FLOPs
    convention for MFU. VALID convs and dot_general match XLA exactly
    (asserted below). At this tiny 32x32 spatial size border positions
    are a large fraction (~13%); at the real 112x112 flagship they are
    a few percent."""
    from protoasnet_tpu.models.builder import build_model, init_model

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3,
           "prototype_shape": (8, 256, 1, 1, 1),
           "num_classes": 4, "img_size": 32}
    model = build_model(cfg)
    x = jnp.zeros((2, 8, 32, 32, 3))
    params, stats = init_model(model, x, seed=0)
    variables = {"params": params, "batch_stats": stats}

    fn = lambda v, xc: model.apply(v, xc, train=False)[0]  # noqa: E731
    analytic = count_flops(fn, variables, x)

    compiled = jax.jit(fn).lower(variables, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    xla_flops = float(ca["flops"])
    ratio = analytic / xla_flops
    # analytic >= XLA (XLA skips padded-window MACs); bounded above by
    # the border-position fraction at this spatial size.
    assert 1.0 <= ratio < 1.2, (analytic, xla_flops)


def test_valid_conv_and_dot_match_xla_exactly():
    """Where no padding is involved, the walker equals XLA's count."""
    x = jnp.zeros((2, 16, 16, 64))
    w = jnp.zeros((3, 3, 64, 144))
    f = lambda x, w: jax.lax.conv_general_dilated(  # noqa: E731
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    analytic = count_flops(f, x, w)
    ca = jax.jit(f).lower(x, w).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    assert analytic == float(ca["flops"])
