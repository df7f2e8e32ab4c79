"""Pallas TPU kernel: fused occurrence-weighted ROI pooling + cosine head.

Fuses ProtoASNet's prototype head (reference forward,
Video_XProtoNet.py:82-98) into one VMEM-resident kernel per sample:

    roi[p, :] = sum_s occ[s, p] * feat[s, :]          (MXU: (P,S)@(S,D))
    sim01[p]  = (cos(roi[p], proto[p]) + 1) / 2        (VPU epilogue)

vs the XLA path (ops/roi_cosine.py) this keeps the (S, P) occurrence and
(S, D) feature tiles in VMEM and computes the cosine epilogue in-register —
no (N, P, D) round trip to HBM for the similarity computation. Shapes for
the flagship config: S = 8*14*14 = 1568, P = 40, D = 256 -> ~1.9 MB of
VMEM per sample, well under the ~16 MB budget.

Training works through a custom VJP whose backward is plain XLA (the
backward is matmul-dominated and fuses well already).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["roi_cosine_pallas"]

_EPS = 1e-8


def _kernel(occ_ref, feat_ref, proto_ref, pnorm_ref, roi_ref, sim_ref):
    occ = occ_ref[0]  # (S, P) non-negative occurrence
    feat = feat_ref[0]  # (S, D)
    # (P, D) = (P, S) @ (S, D) on the MXU, fp32 accumulate
    roi = jax.lax.dot_general(
        occ, feat, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    proto = proto_ref[:]  # (P, D)
    dot = jnp.sum(roi * proto, axis=1, keepdims=True)  # (P, 1)
    rnorm = jnp.maximum(
        jnp.sqrt(jnp.sum(roi * roi, axis=1, keepdims=True)), _EPS
    )
    cos = dot / (rnorm * pnorm_ref[:])  # (P, 1)
    roi_ref[0] = roi
    sim_ref[0, 0] = ((cos + 1.0) * 0.5)[:, 0]


def _forward(occ2, feat2, protos, interpret: bool):
    n, s, p = occ2.shape
    d = feat2.shape[-1]
    pnorm = jnp.maximum(
        jnp.linalg.norm(protos.astype(jnp.float32), axis=1, keepdims=True), _EPS
    )  # (P, 1)
    roi, sim = pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, p, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # (1, 1, P) block: TPU lowering requires the last two block dims
            # to divide (8, 128) or equal the array dims
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, p, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, p), jnp.float32),
        ],
        interpret=interpret,
    )(occ2.astype(jnp.float32), feat2.astype(jnp.float32),
      protos.astype(jnp.float32), pnorm)
    return roi, sim[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _roi_cosine(occ2, feat2, protos, interpret):
    return _forward(occ2, feat2, protos, interpret)


def _fwd(occ2, feat2, protos, interpret):
    roi, sim = _forward(occ2, feat2, protos, interpret)
    return (roi, sim), (occ2, feat2, protos, roi)


def _bwd(interpret, residuals, grads):
    occ2, feat2, protos, roi = residuals
    g_roi, g_sim = grads
    roi = roi.astype(jnp.float32)
    protos = protos.astype(jnp.float32)
    rnorm = jnp.maximum(jnp.linalg.norm(roi, axis=-1, keepdims=True), _EPS)
    pnorm = jnp.maximum(jnp.linalg.norm(protos, axis=-1, keepdims=True), _EPS)
    cos = jnp.sum(roi * protos[None], axis=-1, keepdims=True) / (rnorm * pnorm[None])
    # sim01 = (cos + 1)/2 -> d sim/d cos = 0.5
    g_cos = (0.5 * g_sim)[..., None]  # (N, P, 1)
    # d cos/d roi = p/(|r||p|) - cos * r/|r|^2
    d_roi = g_cos * (protos[None] / (rnorm * pnorm[None]) - cos * roi / (rnorm**2))
    g_roi_total = g_roi + d_roi  # (N, P, D)
    hp = jax.lax.Precision.HIGHEST
    g_feat = jnp.einsum("nsp,npd->nsd", occ2, g_roi_total, precision=hp)
    g_occ = jnp.einsum("nsd,npd->nsp", feat2, g_roi_total, precision=hp)
    # d cos/d proto = r/(|r||p|) - cos * p/|p|^2, summed over batch
    d_p = g_cos * (roi / (rnorm * pnorm[None]) - cos * protos[None] / (pnorm[None] ** 2))
    g_protos = jnp.sum(d_p, axis=0)
    # cotangent dtypes must match the primals (bf16 models)
    return (g_occ.astype(occ2.dtype), g_feat.astype(feat2.dtype),
            g_protos.astype(residuals[2].dtype))


_roi_cosine.defvjp(_fwd, _bwd)


def roi_cosine_pallas(occ, feat, prototypes, interpret=None):
    """Drop-in replacement for the XLA head (roi_cosine.roi_cosine_head):
    occ (N, ..., P) non-negative, feat (N, ..., D), prototypes (P, D) ->
    (roi (N, P, D), sim01 (N, P))."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = occ.shape[0]
    p = occ.shape[-1]
    d = feat.shape[-1]
    occ2 = occ.reshape(n, -1, p)
    feat2 = feat.reshape(n, -1, d)
    return _roi_cosine(occ2, feat2, prototypes, interpret)
