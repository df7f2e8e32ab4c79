#!/usr/bin/env python
"""Probe: does XLA hit the TPU v5e int8 MXU path (2x bf16 peak)?

v5e peak: ~197 TF/s bf16, ~394 TOPS int8. If int8 GEMMs/convs measure
near 2x bf16 at flagship-ish shapes, a w8a8 quantized serving path is a
real lever for inference throughput; if XLA emulates int8 via upcast, it
will measure AT OR BELOW bf16 and the lever is dead (document either way).

Methodology: chained data-dependent ops inside one jitted fori_loop +
two-point fit (cancels the axon relay's fixed per-call overhead); host
readback of a scalar forces completion. Same recipe as bench.py.

Usage: python experiments/int8_probe.py
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fit(run, n1=4, n2=16):
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def gemm_probe(m, k, n, dtype, acc_dtype):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, (m, k), dtype=np.int8))
        b = jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))
    else:
        a = jnp.asarray(rng.normal(size=(m, k)), dtype=dtype)
        b = jnp.asarray(rng.normal(size=(k, n)), dtype=dtype)

    @jax.jit
    def chained(a, b, nit):
        def body(i, a):
            y = jax.lax.dot(a, b, preferred_element_type=acc_dtype)
            if dtype == jnp.int8:
                # fold the int32 accumulator back to int8 (cheap VPU ops)
                return (y >> 8).astype(jnp.int8)[:, :k]
            return (y * 1e-6).astype(dtype)[:, :k]
        out = jax.lax.fori_loop(0, nit, body, a)
        return out.astype(jnp.float32).sum()

    float(chained(a, b, 1))  # compile

    def run(nit):
        t0 = time.time()
        float(chained(a, b, nit))
        return time.time() - t0

    dt = fit(run)
    flops = 2 * m * k * n
    return flops / dt / 1e12


def conv_probe(shape, cout, ksz, dtype, acc_dtype):
    """Channels-last NHWC conv, stride 1, SAME — the backbone's hot shape."""
    rng = np.random.default_rng(0)
    n, h, w, cin = shape
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, shape, dtype=np.int8))
        kern = jnp.asarray(
            rng.integers(-127, 127, (ksz, ksz, cin, cout), dtype=np.int8))
    else:
        x = jnp.asarray(rng.normal(size=shape), dtype=dtype)
        kern = jnp.asarray(rng.normal(size=(ksz, ksz, cin, cout)),
                           dtype=dtype)
    dn = jax.lax.conv_dimension_numbers(shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def chained(x, kern, nit):
        def body(i, x):
            y = jax.lax.conv_general_dilated(
                x, kern, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=acc_dtype)
            if dtype == jnp.int8:
                return (y >> 8).astype(jnp.int8)[..., :cin]
            return (y * 1e-6).astype(dtype)[..., :cin]
        out = jax.lax.fori_loop(0, nit, body, x)
        return out.astype(jnp.float32).sum()

    float(chained(x, kern, 1))

    def run(nit):
        t0 = time.time()
        float(chained(x, kern, nit))
        return time.time() - t0

    dt = fit(run)
    flops = 2 * n * h * w * cin * cout * ksz * ksz
    return flops / dt / 1e12


def main():
    log(f"device: {jax.devices()[0]}")
    print("== GEMM 4096x4096x4096 ==")
    tf_bf16 = gemm_probe(4096, 4096, 4096, jnp.bfloat16, jnp.float32)
    print(f"bf16: {tf_bf16:.1f} TF/s")
    tf_i8 = gemm_probe(4096, 4096, 4096, jnp.int8, jnp.int32)
    print(f"int8: {tf_i8:.1f} TOPS  (ratio {tf_i8 / tf_bf16:.2f}x)")

    # flagship spatial-conv shape: batch128 serving -> (N*T)=4096 frames,
    # but probe a VMEM-friendly slice: 512 frames of 28x28x128 -> 3x3x128->128
    for shape, cout, ksz in [((512, 28, 28, 128), 128, 3),
                             ((512, 56, 56, 64), 64, 3)]:
        print(f"== conv {shape} k{ksz} -> {cout} ==")
        c_bf16 = conv_probe(shape, cout, ksz, jnp.bfloat16, jnp.float32)
        print(f"bf16: {c_bf16:.1f} TF/s")
        c_i8 = conv_probe(shape, cout, ksz, jnp.int8, jnp.int32)
        print(f"int8: {c_i8:.1f} TOPS  (ratio {c_i8 / c_bf16:.2f}x)")


if __name__ == "__main__":
    main()
