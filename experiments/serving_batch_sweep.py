#!/usr/bin/env python
"""Serving-batch ceiling sweep with DEVICE-GENERATED inputs.

The round-2 inference sweep stopped at batch 128 because the relay could
not stage larger float32 inputs in bounded time. Here the input is
generated ON DEVICE (jax.random.normal inside jit — zero H2D), so the
sweep measures the pure compute ceiling of the flagship video model at
batches past the staging limit.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
       experiments/serving_batch_sweep.py [--fp32] [--const]

--const binds the weight pytree as jit compile-time constants (the
shipped serving path since the const-weights A/B, serve.py:35-97) —
re-checks whether the +29% layout-prepacking win moves the batch
optimum.

MEASURED RESULTS: see bottom.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.models.builder import build_model, init_model


def main():
    dt = "float32" if "--fp32" in sys.argv else "bfloat16"
    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3,
           "prototype_shape": (40, 256, 1, 1, 1), "num_classes": 4,
           "img_size": 112, "dtype": dt}
    model = build_model(cfg)
    params, stats = init_model(model, jnp.zeros((1, 32, 112, 112, 3)),
                               seed=0)
    variables = {"params": params, "batch_stats": stats}
    const = "--const" in sys.argv
    if const:
        host_vars = jax.tree_util.tree_map(np.asarray, variables)
    print(f"device={jax.devices()[0].platform} dtype={dt} const={const}",
          flush=True)

    for b in (64, 128, 192, 256, 384):
        if const:
            @jax.jit
            def chained(key, n, b=b):
                x = jax.random.normal(key, (b, 32, 112, 112, 3),
                                      jnp.float32)

                def body(i, xc):
                    logits = model.apply(host_vars, xc, train=False)[0]
                    return xc + 1e-6 * logits.sum()
                return jax.lax.fori_loop(0, n, body, x).sum()

            call = chained
        else:
            @jax.jit
            def chained(v, key, n, b=b):
                x = jax.random.normal(key, (b, 32, 112, 112, 3),
                                      jnp.float32)

                def body(i, xc):
                    logits = model.apply(v, xc, train=False)[0]
                    return xc + 1e-6 * logits.sum()
                return jax.lax.fori_loop(0, n, body, x).sum()

            def call(key, n):
                return chained(variables, key, n)

        try:
            key = jax.random.PRNGKey(0)
            t0 = time.time()
            float(call(key, 1))
            compile_s = time.time() - t0
            t0 = time.time(); float(call(key, 3))
            t3 = time.time() - t0
            t0 = time.time(); float(call(key, 13))
            t13 = time.time() - t0
            ms = (t13 - t3) / 10 * 1000
            print(f"batch {b:4d}: {b / ms * 1000:7.1f} clips/s "
                  f"({ms:6.1f} ms/batch; compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"batch {b:4d}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()


# MEASURED RESULTS (v5e-1, bf16, device-generated inputs, 3/13-iteration
# two-point fit, 2026-08-17):
#
#   batch  64:  543 clips/s
#   batch 128:  635 clips/s   <- the shipped serving config (bench.py)
#   batch 192:  508 clips/s   (tiling misfit: 192 = 1.5 x 128 splits the
#                              batch dim across MXU passes unevenly)
#   batch 256:  661 clips/s   <- pure-compute ceiling, +4% over 128
#   batch 384:  OOM (HLO temp; 16 GB HBM)
#
# Reading: the compute ceiling is ~661 clips/s at batch 256; batch 128
# keeps 96% of it and is the largest input the relay can stage in bounded
# time, so it remains the shipped default. On a PCIe-attached host with
# uint8 staging, batch 256 would be the serving sweet spot.
#
# --const (weights as compile-time constants, the shipped serving path,
# 2026-08-19):
#
#   batch  64:  549.7 clips/s
#   batch 128:  823.6 clips/s   <- shipped serving config (96% of ceiling)
#   batch 192:  663.6 clips/s   (same 1.5x-128 tiling misfit as args mode)
#   batch 256:  860.6 clips/s   <- const-weights compute ceiling (+4.5%)
#   batch 384:  OOM (21.3 GB HLO temp vs 15.75 GB hbm)
#
# Reading: the const-weights layout-prepacking win holds across batches
# (+29% at 128, +30% at 256) and does NOT move the optimum: 256 peaks,
# 128 keeps 96% of it with half the latency and remains the default.
