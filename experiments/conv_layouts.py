#!/usr/bin/env python
"""Micro-benchmark: layer1 (2+1)D conv formulations on the real chip.

The round-1 profile pins ~60% of flagship forward time on the layer1
(1,3,3) convs at (B,32,56,56,64) running ~35% MXU utilization. This
script times mathematically-identical formulations to find the fastest
XLA lowering:

  spatial (1,3,3):  A) 3-D NDHWC conv (current)
                    B) 2-D NHWC conv over reshaped (B*T, H, W, C)
  temporal (3,1,1): A) 3-D NDHWC conv (current)
                    B) 2-D conv over (B, T, H*W, C) with kernel (3,1)

Each timed as fwd-only and fwd+bwd, fp32 and bf16, via chained fori_loop
two-point fits (relay-safe; see bench.py methodology).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    B, T, H, W, C = 8, 32, 56, 56, 64
    MID, OUT = 144, 64
    dt = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)), dt)
    ks = jnp.asarray(rng.normal(size=(1, 3, 3, C, MID)) * 0.05, dt)
    kt = jnp.asarray(rng.normal(size=(3, 1, 1, MID, OUT)) * 0.05, dt)

    def spatial_3d(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def spatial_2d(x, k):
        b, t, h, w, c = x.shape
        y = lax.conv_general_dilated(
            x.reshape(b * t, h, w, c), k[0], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(b, t, h, w, -1)

    def temporal_3d(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def temporal_2d(x, k):
        b, t, h, w, c = x.shape
        y = lax.conv_general_dilated(
            x.reshape(b, t, h * w, c), k[:, :, 0], (1, 1), [(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(b, t, h, w, -1)

    xm = jnp.asarray(rng.normal(size=(B, T, H, W, MID)), dt)

    # verify exactness
    np.testing.assert_allclose(
        np.asarray(spatial_3d(x, ks), np.float32),
        np.asarray(spatial_2d(x, ks), np.float32), rtol=2e-2, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(temporal_3d(xm, kt), np.float32),
        np.asarray(temporal_2d(xm, kt), np.float32), rtol=2e-2, atol=1e-2)

    def grad_reduce(fn, k):
        def f(x, k):
            return fn(x, k).sum()
        g = jax.grad(f, argnums=(0,))
        def run(x, kk):
            return g(x, kk)[0]
        return run

    results = {}
    for name, fn, k, inp in [
        ("spatial_3d", spatial_3d, ks, x),
        ("spatial_2d", spatial_2d, ks, x),
        ("temporal_3d", temporal_3d, kt, xm),
        ("temporal_2d", temporal_2d, kt, xm),
    ]:
        def fwd(xc, kk=k, f=fn):
            return 1e-6 * f(xc, kk).sum()

        def fwdbwd(xc, kk=k, f=fn):
            l, g = jax.value_and_grad(lambda xx: f(xx, kk).sum())(xc)
            return 1e-6 * l + 1e-6 * g

        # chained fwd
        @jax.jit
        def chain_f(xc, n, f=fwd):
            def body(i, acc):
                return acc + f(acc)
            return lax.fori_loop(0, n, body, xc).sum()

        @jax.jit
        def chain_fb(xc, n, f=fwdbwd):
            def body(i, acc):
                return acc + f(acc)
            return lax.fori_loop(0, n, body, xc).sum()

        float(chain_f(inp, 1))
        t0 = time.time(); float(chain_f(inp, 5)); ta = time.time() - t0
        t0 = time.time(); float(chain_f(inp, 25)); tb = time.time() - t0
        ms_f = (tb - ta) / 20 * 1000
        float(chain_fb(inp, 1))
        t0 = time.time(); float(chain_fb(inp, 5)); ta = time.time() - t0
        t0 = time.time(); float(chain_fb(inp, 25)); tb = time.time() - t0
        ms_fb = (tb - ta) / 20 * 1000
        cin = inp.shape[-1]
        cout = MID if "spatial" in name else OUT
        taps = 9 if "spatial" in name else 3
        gflop = 2 * B * T * H * W * cin * cout * taps / 1e9
        print(f"{name:12s} fwd {ms_f:7.2f} ms ({gflop / ms_f:6.1f} TF/s)  "
              f"fwd+bwd {ms_fb:7.2f} ms ({3 * gflop / ms_fb:6.1f} TF/s)",
              flush=True)
        results[name] = (ms_f, ms_fb)


def matmul_variants():
    """Shifted-GEMM formulations: a (3,1,1) temporal conv is 3 T-shifted
    (M, C) @ (C, O) matmuls; a (1,3,3) spatial conv is 9 HW-shifted ones.
    Matmuls hit the MXU at near-peak where XLA's conv lowering measured
    ~61 TF/s (spatial) / ~19 TF/s fwd (temporal)."""
    B, T, H, W, C = 8, 32, 56, 56, 64
    MID, OUT = 144, 64
    dt = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)), dt)
    xm = jnp.asarray(rng.normal(size=(B, T, H, W, MID)), dt)
    ks = jnp.asarray(rng.normal(size=(1, 3, 3, C, MID)) * 0.05, dt)
    kt = jnp.asarray(rng.normal(size=(3, 1, 1, MID, OUT)) * 0.05, dt)

    def temporal_mm2(x, k):
        # pad T then 3 full-tensor matmuls + adds (no scatter)
        b, t, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        return (xp[:, :-2] @ k[0, 0, 0] + xp[:, 1:-1] @ k[1, 0, 0]
                + xp[:, 2:] @ k[2, 0, 0])

    def spatial_mm(x, k):
        b, t, h, w, c = x.shape
        o = k.shape[-1]
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        y = None
        for dh in range(3):
            for dw in range(3):
                part = xp[:, :, dh:dh + h, dw:dw + w] @ k[0, dh, dw]
                y = part if y is None else y + part
        return y

    def temporal_3d(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def spatial_3d(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    np.testing.assert_allclose(np.asarray(temporal_mm2(xm, kt), np.float32),
                               np.asarray(temporal_3d(xm, kt), np.float32),
                               rtol=5e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(spatial_mm(x, ks), np.float32),
                               np.asarray(spatial_3d(x, ks), np.float32),
                               rtol=5e-2, atol=3e-2)

    for name, fn, k, inp, cout, taps in [
        ("temporal_mm2", temporal_mm2, kt, xm, OUT, 3),
        ("spatial_mm", spatial_mm, ks, x, MID, 9),
        ("temporal_3d", temporal_3d, kt, xm, OUT, 3),
        ("spatial_3d", spatial_3d, ks, x, MID, 9),
    ]:
        def fwdbwd(xc, kk=k, f=fn):
            l, g = jax.value_and_grad(lambda xx: f(xx, kk).sum())(xc)
            return 1e-6 * l + 1e-6 * g

        def fwd(xc, kk=k, f=fn):
            return 1e-6 * f(xc, kk).sum()

        @jax.jit
        def chain_f(xc, n, f=fwd):
            def body(i, acc):
                return acc + f(acc)
            return lax.fori_loop(0, n, body, xc).sum()

        @jax.jit
        def chain_fb(xc, n, f=fwdbwd):
            def body(i, acc):
                return acc + f(acc)
            return lax.fori_loop(0, n, body, xc).sum()

        float(chain_f(inp, 1))
        t0 = time.time(); float(chain_f(inp, 5)); ta = time.time() - t0
        t0 = time.time(); float(chain_f(inp, 25)); tb = time.time() - t0
        ms_f = (tb - ta) / 20 * 1000
        float(chain_fb(inp, 1))
        t0 = time.time(); float(chain_fb(inp, 5)); ta = time.time() - t0
        t0 = time.time(); float(chain_fb(inp, 25)); tb = time.time() - t0
        ms_fb = (tb - ta) / 20 * 1000
        cin = inp.shape[-1]
        gflop = 2 * B * T * H * W * cin * cout * taps / 1e9
        print(f"{name:13s} fwd {ms_f:7.2f} ms ({gflop / ms_f:6.1f} TF/s)  "
              f"fwd+bwd {ms_fb:7.2f} ms ({3 * gflop / ms_fb:6.1f} TF/s)",
              flush=True)


if __name__ == "__main__":
    if "--mm" in sys.argv:
        matmul_variants()
    else:
        main()
