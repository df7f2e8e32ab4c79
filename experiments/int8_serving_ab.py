#!/usr/bin/env python
"""A/B: flagship serving forward, bf16 vs w8a8-quantized, on the real chip.

Measures the compute-marginal clips/s (chained fori_loop + two-point fit,
bench.py methodology) of the shipped Video_XProtoNet flagship at the
batch-128 serving sweet spot, with and without quant.py's int8 backbone.
Also reports the logit agreement between the two paths on the same batch.

Usage: python experiments/int8_serving_ab.py [--batch 128] [--quick]
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from protoasnet_tpu.models.builder import build_model, init_model
    from protoasnet_tpu.quant import (apply_quantized, build_qstate,
                                      calibrate_act_scales)

    log(f"device: {jax.devices()[0]}")
    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3,
           "prototype_shape": (40, 256, 1, 1, 1), "num_classes": 4,
           "img_size": 112, "dtype": "bfloat16"}
    model = build_model(cfg)
    b = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, 32, 112, 112, 3))
                    .astype(np.float32))
    params, batch_stats = init_model(model, x[:1], seed=0)
    variables = {"params": params, "batch_stats": batch_stats}

    # calibrate on a slice of the batch (scales only need coverage, not b=128)
    t0 = time.time()
    scales = calibrate_act_scales(model, variables, [x[:8]])
    qstate = build_qstate(variables, scales)  # Conv2Plus1D pairs folded
    qstate_nf = build_qstate(variables, scales, fold_conv2plus1d=False)
    n_folded = sum("fold_m" in q for q in qstate.values())
    log(f"calibrated {len(scales)} convs ({n_folded} folded pairs) "
        f"in {time.time() - t0:.1f}s")

    @jax.jit
    def chained_fp(v, x, n):
        def body(i, xc):
            logits = model.apply(v, xc, train=False)[0]
            return xc + 1e-6 * logits.sum()
        return jax.lax.fori_loop(0, n, body, x).sum()

    @jax.jit
    def chained_q(v, q, x, n):
        def body(i, xc):
            logits = apply_quantized(model, v, q, xc)[0]
            return xc + 1e-6 * logits.sum()
        return jax.lax.fori_loop(0, n, body, x).sum()

    def marginal(fn, *fargs):
        float(fn(*fargs, 1))  # compile + warm
        n1, n2 = (3, 10) if args.quick else (10, 40)

        def run(n):
            t0 = time.time()
            float(fn(*fargs, n))
            return time.time() - t0

        t1, t2 = run(n1), run(n2)
        return (t2 - t1) / (n2 - n1)

    dt_fp = marginal(chained_fp, variables, x)
    log(f"bf16:        {dt_fp * 1e3:.1f} ms/fwd -> {b / dt_fp:.1f} clips/s")
    dt_nf = marginal(chained_q, variables, qstate_nf, x)
    log(f"int8:        {dt_nf * 1e3:.1f} ms/fwd -> {b / dt_nf:.1f} clips/s "
        f"({dt_fp / dt_nf:.2f}x)")
    dt_q = marginal(chained_q, variables, qstate, x)
    log(f"int8+folded: {dt_q * 1e3:.1f} ms/fwd -> {b / dt_q:.1f} clips/s "
        f"({dt_fp / dt_q:.2f}x vs bf16, {dt_nf / dt_q:.2f}x vs unfolded)")

    # logit agreement on one batch
    lf = np.asarray(model.apply(variables, x[:16], train=False)[0],
                    np.float64)
    lq = np.asarray(apply_quantized(model, variables, qstate, x[:16])[0],
                    np.float64)
    rel = np.abs(lf - lq).max() / (np.abs(lf).max() + 1e-9)
    cos = (lf * lq).sum() / (np.linalg.norm(lf) * np.linalg.norm(lq) + 1e-12)
    log(f"logit rel-max-err {rel:.4f}  cos {cos:.6f}")
    print(f"bf16 {b / dt_fp:.1f} clips/s | int8 {b / dt_q:.1f} clips/s | "
          f"speedup {dt_fp / dt_q:.2f}x | rel_err {rel:.4f}")


if __name__ == "__main__":
    main()
