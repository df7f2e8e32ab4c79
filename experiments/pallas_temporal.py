#!/usr/bin/env python
"""Pallas prototype: (3,1,1) temporal conv as 3 accumulated MXU matmuls.

XLA's lowering of the R(2+1)D temporal conv measured 19 TF/s FORWARD at
the layer1 shape (vs ~60 for the spatial conv and ~100+ for its own
backward parts) — the one clearly-underperforming op in the backbone.
This kernel streams (1, 1, S_blk, C) input tiles at t-1/t/t+1 (three
shifted views of a once-padded input) through the MXU against the three
(C, O) taps, accumulating in VMEM.

Run on chip: PYTHONPATH=/root/repo:/root/.axon_site python
experiments/pallas_temporal.py [--bf16] [--v2|--v3]

MEASURED CONCLUSION (v5e, bf16, layer1 shape): every Pallas formulation
LOSES to XLA's conv —
  v1 (t-shifted block streams):      9.2 TF/s (3x read amplification)
  v2 (manual HBM DMA, T-blocked):    Mosaic rejects C=144 slices
                                     (last dim must be 128-aligned)
  v3 (full-T blocks, auto-pipeline): 11.7 TF/s (VMEM lane padding
                                     144->256 wastes ~1.8x bandwidth)
  XLA conv_general_dilated:          ~20 TF/s fwd, ~63 composite bwd
The architecture's non-128-multiple channel counts defeat hand-written
kernels the same way they cap XLA; XLA's internal conv layouts avoid
the VMEM lane padding a Pallas kernel pays. Kept as evidence for the
perf story (BASELINE.md, DESIGN.md §9) — the backbone stays on XLA
convs deliberately.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl


def _kernel(x0_ref, x1_ref, x2_ref, k_ref, o_ref):
    # x*_ref: (1, 1, S_blk, C); k_ref: (3, C, O); o_ref: (1, 1, S_blk, O)
    x0 = x0_ref[0, 0]
    x1 = x1_ref[0, 0]
    x2 = x2_ref[0, 0]
    acc = jnp.dot(x0, k_ref[0], preferred_element_type=jnp.float32)
    acc += jnp.dot(x1, k_ref[1], preferred_element_type=jnp.float32)
    acc += jnp.dot(x2, k_ref[2], preferred_element_type=jnp.float32)
    o_ref[0, 0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s_blk",))
def temporal_conv_pallas(x, k, s_blk=1024):
    """x: (B, T, S, C); k: (3, C, O) -> (B, T, S, O). SAME padding in T."""
    b, t, s, c = x.shape
    o = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    n_s = s // s_blk
    grid = (b, t, n_s)
    in_specs = [
        pl.BlockSpec((1, 1, s_blk, c), lambda bi, ti, si: (bi, ti, si, 0)),
        pl.BlockSpec((1, 1, s_blk, c), lambda bi, ti, si: (bi, ti + 1, si, 0)),
        pl.BlockSpec((1, 1, s_blk, c), lambda bi, ti, si: (bi, ti + 2, si, 0)),
        pl.BlockSpec((3, c, o), lambda bi, ti, si: (0, 0, 0)),
    ]
    out_spec = pl.BlockSpec((1, 1, s_blk, o), lambda bi, ti, si: (bi, ti, si, 0))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, s, o), x.dtype),
    )(xp, xp, xp, k)


def main():
    B, T, H, W, C, O = 8, 32, 56, 56, 144, 64
    dt = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    rng = np.random.default_rng(0)
    S = H * W  # 3136; pad to s_blk multiple below
    s_blk = 784  # 3136 = 4 * 784; 784 = 98 sublanes * ... (multiple of 8)
    x = jnp.asarray(rng.normal(size=(B, T, S, C)), dt)
    k = jnp.asarray(rng.normal(size=(3, C, O)) * 0.05, dt)

    y_p = temporal_conv_pallas(x, k, s_blk=s_blk)

    def temporal_ref(x, k):
        x5 = x.reshape(B, T, H, W, C)
        k5 = k[:, None, None].transpose(0, 1, 2, 3, 4)  # (3,1,1,C,O)
        y = lax.conv_general_dilated(
            x5, k.reshape(3, 1, 1, C, O), (1, 1, 1),
            [(1, 1), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y.reshape(B, T, S, O)

    y_r = temporal_ref(x, k)
    err = np.max(np.abs(np.asarray(y_p, np.float32) - np.asarray(y_r, np.float32)))
    rel = err / (np.max(np.abs(np.asarray(y_r, np.float32))) + 1e-9)
    print(f"max abs err {err:.4g} (rel {rel:.2e})", flush=True)
    assert rel < 2e-2

    gflop = 2 * B * T * S * C * O * 3 / 1e9

    for name, fn in [("pallas", lambda xx: temporal_conv_pallas(xx, k, s_blk=s_blk)),
                     ("xla   ", lambda xx: temporal_ref(xx, k))]:
        @jax.jit
        def chain(xc, n, f=fn):
            def body(i, acc):
                return acc + 1e-6 * f(acc).sum()
            return lax.fori_loop(0, n, body, xc).sum()

        float(chain(x, 1))
        t0 = time.time(); float(chain(x, 5)); ta = time.time() - t0
        t0 = time.time(); float(chain(x, 25)); tb = time.time() - t0
        ms = (tb - ta) / 20 * 1000
        print(f"{name} fwd {ms:7.2f} ms ({gflop / ms:6.1f} TF/s)", flush=True)


# ---- v2: T-blocked with manual HBM->VMEM DMA (window loaded ONCE per
# program: read amplification (T_blk+2)/T_blk instead of 3x)

from jax.experimental.pallas import tpu as pltpu


def _kernel_v2(xp_hbm, k_ref, o_ref, scratch, sem, *, t_blk):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    si = pl.program_id(2)
    s_blk = o_ref.shape[2]
    dma = pltpu.make_async_copy(
        xp_hbm.at[bi, pl.ds(ti * t_blk, t_blk + 2),
                  pl.ds(si * s_blk, s_blk), :],
        scratch, sem)
    dma.start()
    dma.wait()
    for t in range(t_blk):
        acc = jnp.dot(scratch[t], k_ref[0],
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(scratch[t + 1], k_ref[1],
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(scratch[t + 2], k_ref[2],
                       preferred_element_type=jnp.float32)
        o_ref[0, t] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s_blk", "t_blk"))
def temporal_conv_pallas_v2(x, k, s_blk=784, t_blk=8):
    b, t, s, c = x.shape
    o = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    grid = (b, t // t_blk, s // s_blk)
    return pl.pallas_call(
        functools.partial(_kernel_v2, t_blk=t_blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((3, c, o), lambda bi, ti, si: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_blk, s_blk, o),
                               lambda bi, ti, si: (bi, ti, si, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, s, o), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t_blk + 2, s_blk, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, k)


def main_v2():
    B, T, H, W, C, O = 8, 32, 56, 56, 144, 64
    dt = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    rng = np.random.default_rng(0)
    S = H * W
    x = jnp.asarray(rng.normal(size=(B, T, S, C)), dt)
    k = jnp.asarray(rng.normal(size=(3, C, O)) * 0.05, dt)

    def temporal_ref(x, k):
        x5 = x.reshape(B, T, H, W, C)
        y = lax.conv_general_dilated(
            x5, k.reshape(3, 1, 1, C, O), (1, 1, 1),
            [(1, 1), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y.reshape(B, T, S, O)

    y_p = temporal_conv_pallas_v2(x, k)
    y_r = temporal_ref(x, k)
    rel = (np.max(np.abs(np.asarray(y_p, np.float32) - np.asarray(y_r, np.float32)))
           / (np.max(np.abs(np.asarray(y_r, np.float32))) + 1e-9))
    print(f"v2 rel err {rel:.2e}", flush=True)
    assert rel < 2e-2

    gflop = 2 * B * T * S * C * O * 3 / 1e9
    for name, fn in [("pallas_v2", lambda xx: temporal_conv_pallas_v2(xx, k)),
                     ("xla      ", lambda xx: temporal_ref(xx, k))]:
        @jax.jit
        def chain(xc, n, f=fn):
            def body(i, acc):
                return acc + 1e-6 * f(acc).sum()
            return lax.fori_loop(0, n, body, xc).sum()

        float(chain(x, 1))
        t0 = time.time(); float(chain(x, 5)); ta = time.time() - t0
        t0 = time.time(); float(chain(x, 25)); tb = time.time() - t0
        ms = (tb - ta) / 20 * 1000
        print(f"{name} fwd {ms:7.2f} ms ({gflop / ms:6.1f} TF/s)", flush=True)




# ---- v3: full-T blocks via standard (auto-pipelined) BlockSpecs: the
# (T+2, S_blk, C) window loads once per program (34/32 read
# amplification); no manual DMA, so the 144-channel lane dim is handled
# by Mosaic's own padding like any other kernel.

def _kernel_v3(x_ref, k_ref, o_ref, *, t_out):
    for t in range(t_out):
        acc = jnp.dot(x_ref[0, t], k_ref[0],
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(x_ref[0, t + 1], k_ref[1],
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(x_ref[0, t + 2], k_ref[2],
                       preferred_element_type=jnp.float32)
        o_ref[0, t] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s_blk",))
def temporal_conv_pallas_v3(x, k, s_blk=224):
    b, t, s, c = x.shape
    o = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    grid = (b, s // s_blk)
    return pl.pallas_call(
        functools.partial(_kernel_v3, t_out=t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t + 2, s_blk, c), lambda bi, si: (bi, 0, si, 0)),
            pl.BlockSpec((3, c, o), lambda bi, si: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, s_blk, o), lambda bi, si: (bi, 0, si, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, s, o), x.dtype),
    )(xp, k)


def main_v3():
    B, T, H, W, C, O = 8, 32, 56, 56, 144, 64
    dt = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    rng = np.random.default_rng(0)
    S = H * W
    x = jnp.asarray(rng.normal(size=(B, T, S, C)), dt)
    k = jnp.asarray(rng.normal(size=(3, C, O)) * 0.05, dt)

    def temporal_ref(x, k):
        x5 = x.reshape(B, T, H, W, C)
        y = lax.conv_general_dilated(
            x5, k.reshape(3, 1, 1, C, O), (1, 1, 1),
            [(1, 1), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y.reshape(B, T, S, O)

    y_p = temporal_conv_pallas_v3(x, k)
    y_r = temporal_ref(x, k)
    rel = (np.max(np.abs(np.asarray(y_p, np.float32) - np.asarray(y_r, np.float32)))
           / (np.max(np.abs(np.asarray(y_r, np.float32))) + 1e-9))
    print(f"v3 rel err {rel:.2e}", flush=True)
    assert rel < 2e-2

    gflop = 2 * B * T * S * C * O * 3 / 1e9
    for name, fn in [("pallas_v3", lambda xx: temporal_conv_pallas_v3(xx, k)),
                     ("xla      ", lambda xx: temporal_ref(xx, k))]:
        @jax.jit
        def chain(xc, n, f=fn):
            def body(i, acc):
                return acc + 1e-6 * f(acc).sum()
            return lax.fori_loop(0, n, body, xc).sum()

        float(chain(x, 1))
        t0 = time.time(); float(chain(x, 5)); ta = time.time() - t0
        t0 = time.time(); float(chain(x, 25)); tb = time.time() - t0
        ms = (tb - ta) / 20 * 1000
        print(f"{name} fwd {ms:7.2f} ms ({gflop / ms:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    if "--v3" in sys.argv:
        main_v3()
    elif "--v2" in sys.argv:
        main_v2()
    else:
        main()
