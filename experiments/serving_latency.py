#!/usr/bin/env python
"""On-device serving latency vs batch size, bf16 and w8a8.

The serving-batch sweep (serving_batch_sweep.py) mapped the THROUGHPUT
ceiling at large batches; this measures the latency side of the curve a
production deployment trades against: compute ms per forward at batch
1..128 on the flagship video model. Chained fori_loop + two-point fit
(bench.py methodology) isolates on-device latency from this machine's
0.3-0.5 s relay round trip — on a PCIe host, add ~1 ms H2D per 12.8 MB
batch, not the relay numbers.

Usage: python -m experiments.serving_latency [--quick]
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
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16, 32, 64, 128])
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
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(8, 32, 112, 112, 3))
                     .astype(np.float32))
    params, batch_stats = init_model(model, x1[:1], seed=0)
    variables = {"params": params, "batch_stats": batch_stats}
    scales = calibrate_act_scales(model, variables, [x1])
    qstate = build_qstate(variables, scales)
    log(f"calibrated {len(scales)} convs")

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
        n1, n2 = (3, 10) if args.quick else (10, 60)

        def run(n):
            t0 = time.time()
            float(fn(*fargs, n))
            return time.time() - t0

        t1, t2 = run(n1), run(n2)
        return (t2 - t1) / (n2 - n1)

    rows = []
    for b in args.batches:
        xb = jnp.asarray(rng.normal(size=(b, 32, 112, 112, 3))
                         .astype(np.float32))
        ms_fp = marginal(chained_fp, variables, xb) * 1e3
        ms_q = marginal(chained_q, variables, qstate, xb) * 1e3
        rows.append((b, ms_fp, ms_q))
        log(f"batch {b:>3}: bf16 {ms_fp:7.2f} ms ({b / ms_fp * 1e3:7.1f} "
            f"clips/s) | int8 {ms_q:7.2f} ms ({b / ms_q * 1e3:7.1f} "
            f"clips/s, {ms_fp / ms_q:.2f}x)")
    print("batch,bf16_ms,int8_ms")
    for b, f, q in rows:
        print(f"{b},{f:.2f},{q:.2f}")


if __name__ == "__main__":
    main()
