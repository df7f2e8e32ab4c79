"""Pallas TPU kernel: fused L2 patch-distance + global-min-pool (PPNet head).

The classic ProtoPNet prototype layer (reference _l2_convolution + min-pool,
ProtoPNet.py:189-237) in one VMEM-resident kernel per sample:

    dist[s, p]  = relu(|x_s|^2 - 2 <x_s, w_p> + |w_p|^2)   ((S,D)@(D,P) MXU)
    min_d[p]    = min_s dist[s, p]                          (VPU epilogue)

Emits both the full distance map (push needs per-patch distances) and the
min-pooled vector (forward path) without a round trip to HBM in between.

Training works through a custom VJP with an XLA backward (closed-form
gradients of the quadratic + argmin routing for the min)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["l2_min_pallas"]


def _kernel(x_ref, w_ref, p2_ref, dist_ref, min_ref):
    x = x_ref[0]  # (S, D)
    w = w_ref[:]  # (P, D)
    xw = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (S, P)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)  # (S, 1)
    dist = jnp.maximum(x2 - 2.0 * xw + p2_ref[:].T, 0.0)  # (S, P)
    dist_ref[0] = dist
    min_ref[0, 0] = jnp.min(dist, axis=0)


def _forward(x2d, w, interpret: bool):
    n, s, d = x2d.shape
    p = w.shape[0]
    p2 = jnp.sum(w.astype(jnp.float32) ** 2, axis=1, keepdims=True)  # (P, 1)
    dist, min_d = pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, s, p), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, p), jnp.float32),
        ],
        interpret=interpret,
    )(x2d.astype(jnp.float32), w.astype(jnp.float32), p2)
    return dist, min_d[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _l2_min(x2d, w, interpret):
    return _forward(x2d, w, interpret)


def _fwd(x2d, w, interpret):
    dist, min_d = _forward(x2d, w, interpret)
    return (dist, min_d), (x2d, w, dist)


def _bwd(interpret, residuals, grads):
    x2d, w, dist = residuals
    g_dist, g_min = grads
    x2d = x2d.astype(jnp.float32)
    w = w.astype(jnp.float32)
    # route g_min through the argmin patch (first-min tie-break like jnp.min)
    is_min = (dist == jnp.min(dist, axis=1, keepdims=True))
    first = (jnp.cumsum(is_min, axis=1) == 1) & is_min  # (N, S, P)
    g = g_dist + first * g_min[:, None, :]
    g = g * (dist > 0)  # relu gate
    hp = jax.lax.Precision.HIGHEST
    row = jnp.sum(g, axis=2, keepdims=True)  # (N, S, 1)
    g_x = 2.0 * (x2d * row - jnp.einsum("nsp,pd->nsd", g, w, precision=hp))
    col = jnp.sum(g, axis=1)  # (N, P)
    g_w = 2.0 * (w * jnp.sum(col, axis=0)[:, None]
                 - jnp.einsum("nsp,nsd->pd", g, x2d, precision=hp))
    # cotangent dtypes must match the primals (bf16 models)
    return g_x.astype(residuals[0].dtype), g_w.astype(residuals[1].dtype)


_l2_min.defvjp(_fwd, _bwd)


def l2_min_pallas(x, prototypes, interpret=None):
    """x (N, H, W, D) conv features; prototypes (P, 1, 1, D) or (P, D).
    Returns (distances (N, H, W, P), min_distances (N, P))."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, h, w_, d = x.shape
    protos = prototypes.reshape(prototypes.shape[0], -1)
    dist, min_d = _l2_min(x.reshape(n, h * w_, d), protos, interpret)
    return dist.reshape(n, h, w_, -1), min_d
