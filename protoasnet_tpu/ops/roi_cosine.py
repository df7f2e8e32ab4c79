"""Occurrence-weighted ROI pooling + prototype cosine similarity.

This is ProtoASNet's signature compute (reference forward pass,
Video_XProtoNet.py:82-98):

    roi[n, p, :] = sum_{t,h,w} |occ[n, t, h, w, p]| * feat[n, t, h, w, :]
    sim[n, p]    = (cos(roi[n, p, :], proto[p, :]) + 1) / 2

The contraction is an (S x P)^T @ (S x D) batched matmul (S = T*H*W
spatial positions) — exactly MXU shape — so the XLA path below compiles to
a single fused batched GEMM. A Pallas kernel variant that additionally
fuses the |.|-weighting and the cosine normalization lives in
protoasnet_tpu/ops/pallas_roi.py and is selected via ``impl=``.

Cosine matches torch.nn.CosineSimilarity semantics (eps=1e-8 clamp on each
norm) for fp32-tolerance parity with the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["roi_pool", "cosine_similarity_to_prototypes", "roi_cosine_head"]

_EPS = 1e-8


def roi_pool(occ: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
    """ROI-weighted feature pooling (un-normalized, as in the reference).

    occ:  (N, ..., P) non-negative occurrence maps (abs already applied)
    feat: (N, ..., D) feature maps; ... are 1-3 spatial/temporal dims
    returns (N, P, D) float32 ROI features.
    """
    n = occ.shape[0]
    p = occ.shape[-1]
    d = feat.shape[-1]
    occ2 = occ.reshape(n, -1, p)
    feat2 = feat.reshape(n, -1, d)
    # batched (P, S) @ (S, D) on the MXU; at least fp32 (precision=HIGHEST)
    # — the prototype head is parity-critical (BASELINE fp32 tolerance);
    # promote (not pin) so float64 parity tests keep full precision
    acc = jnp.promote_types(jnp.promote_types(occ.dtype, feat.dtype),
                            jnp.float32)
    return jnp.einsum("nsp,nsd->npd", occ2, feat2,
                      preferred_element_type=acc,
                      precision=jax.lax.Precision.HIGHEST)


def cosine_similarity_to_prototypes(roi: jnp.ndarray, prototypes: jnp.ndarray) -> jnp.ndarray:
    """(N, P, D) x (P, D) -> (N, P) cosine in [-1, 1], torch-eps semantics."""
    acc = jnp.promote_types(jnp.promote_types(roi.dtype, prototypes.dtype),
                            jnp.float32)
    roi = roi.astype(acc)
    prototypes = prototypes.astype(acc)
    dot = jnp.sum(roi * prototypes[None], axis=-1)
    n1 = jnp.maximum(jnp.linalg.norm(roi, axis=-1), _EPS)
    n2 = jnp.maximum(jnp.linalg.norm(prototypes, axis=-1), _EPS)
    return dot / (n1 * n2[None])


def roi_cosine_head(occ: jnp.ndarray, feat: jnp.ndarray, prototypes: jnp.ndarray,
                    impl: str = "xla"):
    """Full head: returns (roi_features (N,P,D), similarity01 (N,P)).

    similarity01 = (cos + 1) / 2, the reference's positive-reasoning
    normalization (XProtoNet.py:62).
    """
    if impl == "pallas":
        from protoasnet_tpu.ops.pallas_roi import roi_cosine_pallas

        return roi_cosine_pallas(occ, feat, prototypes)
    roi = roi_pool(occ, feat)
    sim = (cosine_similarity_to_prototypes(roi, prototypes) + 1.0) / 2.0
    return roi, sim
