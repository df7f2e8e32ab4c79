"""Weights-as-constants vs weights-as-arguments serving A/B on the chip.

Discovered by `serve tune` (2026-08-19): the exported flagship bundle
(load_serving_bundle binds the weight pytree in a closure, so under jit
the weights trace as CONSTANTS) measured 822 clips/s at batch 128 where
bench.py's `model.apply(variables, x)` path — weights passed as jit
ARGUMENTS — measures ~638. Hypothesis: constant weights let XLA prepack
conv kernel layouts / fold BN affines at compile time instead of per
call.

This A/B isolates the one variable: the same model, same input, same
chained-fori_loop two-point fit, (a) variables as a jit argument,
(b) variables closed over as constants, (c) closed-over AND pre-cast to
bf16 (does the win survive when the cast is already done?).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -m experiments.const_weights_ab
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from protoasnet_tpu.models.builder import build_model, init_model
    from protoasnet_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()  # compile time is not part of the fits

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3,
           "prototype_shape": (40, 256, 1, 1, 1), "num_classes": 4,
           "img_size": 112, "dtype": "bfloat16"}
    model = build_model(cfg)
    params, stats = init_model(model, jnp.zeros((1, 32, 112, 112, 3)),
                               seed=0)
    variables = {"params": params, "batch_stats": stats}
    rng = np.random.default_rng(0)
    b = 128
    x = jnp.asarray(rng.normal(size=(b, 32, 112, 112, 3)).astype(np.float32))
    jax.block_until_ready(x)
    out = {}

    host_vars = jax.tree_util.tree_map(np.asarray, variables)

    def measure(name, chained):
        t0 = time.time()
        float(chained(x, 1))
        compile_s = time.time() - t0
        n1, n2 = 4, 20

        def run(n):
            t0 = time.time()
            float(chained(x, n))
            return time.time() - t0

        ta, tb = run(n1), run(n2)
        per = (tb - ta) / (n2 - n1)
        out[f"{name}_clips_per_sec"] = round(b / per, 1)
        out[f"{name}_compile_s"] = round(compile_s, 1)
        print(f"{name}: {b / per:7.1f} clips/s ({per * 1000:.1f} ms/batch, "
              f"compile {compile_s:.1f}s)", flush=True)

    # (a) weights as a jit argument (bench.py's infer methodology)
    def arg_chained_fn(v, xx, n):
        def body(i, xc):
            logits = model.apply(v, xc, train=False)[0]
            return xc + 1e-6 * logits.sum()
        return jax.lax.fori_loop(0, n, body, xx).sum()

    arg_jit = jax.jit(arg_chained_fn)
    measure("args", lambda xx, n: arg_jit(variables, xx, n))

    # (b) weights closed over as host numpy -> traced as constants
    def const_chained_fn(xx, n):
        def body(i, xc):
            logits = model.apply(host_vars, xc, train=False)[0]
            return xc + 1e-6 * logits.sum()
        return jax.lax.fori_loop(0, n, body, xx).sum()

    measure("const", jax.jit(const_chained_fn))

    # (c) closed over, pre-cast to bf16 on host (isolates "cast folded at
    # compile time" from "layout prepacking")
    import ml_dtypes

    bf16_vars = jax.tree_util.tree_map(
        lambda a: a.astype(ml_dtypes.bfloat16)
        if np.issubdtype(a.dtype, np.floating) else a, host_vars)

    def bf16_chained_fn(xx, n):
        def body(i, xc):
            logits = model.apply(bf16_vars, xc, train=False)[0]
            return xc + 1e-6 * logits.sum()
        return jax.lax.fori_loop(0, n, body, xx).sum()

    try:
        measure("const_bf16", jax.jit(bf16_chained_fn))
    except Exception as e:  # noqa: BLE001 — dtype plumbing may reject
        out["const_bf16"] = f"FAILED: {type(e).__name__}"
        print(f"const_bf16 failed: {e}", flush=True)

    # --- int8 (w8a8) serving: args vs const. Random-init weights are fine
    # for a perf A/B; calibration just needs activation scales.
    from protoasnet_tpu.quant import (apply_quantized, build_qstate,
                                      calibrate_act_scales)

    calib = [jnp.asarray(rng.normal(
        size=(8, 32, 112, 112, 3)).astype(np.float32)) for _ in range(2)]
    scales = calibrate_act_scales(model, variables, calib)
    qstate = build_qstate(variables, scales)

    def int8_args_fn(v, q, xx, n):
        def body(i, xc):
            logits = apply_quantized(model, v, q, xc)[0]
            return xc + 1e-6 * logits.sum()
        return jax.lax.fori_loop(0, n, body, xx).sum()

    int8_jit = jax.jit(int8_args_fn)
    measure("int8_args", lambda xx, n: int8_jit(variables, qstate, xx, n))

    host_q = jax.tree_util.tree_map(np.asarray, qstate)

    def int8_const_fn(xx, n):
        def body(i, xc):
            logits = apply_quantized(model, host_vars, host_q, xc)[0]
            return xc + 1e-6 * logits.sum()
        return jax.lax.fori_loop(0, n, body, xx).sum()

    measure("int8_const", jax.jit(int8_const_fn))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
