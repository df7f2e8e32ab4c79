"""The 9-term loss library.

Semantics parity with the reference loss classes
(/root/reference/src/loss/loss.py) as pure jit-safe functions:

  mse_loss            MSE                       loss.py:9-20
  ce_loss             CeLoss                    loss.py:23-34
  cluster_patch       ClusterPatch              loss.py:37-65
  separation_patch    SeparationPatch           loss.py:68-96
  cluster_roi         ClusterRoiFeat            loss.py:99-139
  separation_roi      SeparationRoiFeat         loss.py:142-186 (abstain exempt)
  orthogonality_loss  OrthogonalityLoss         loss.py:189-231
  l_norm              L_norm                    loss.py:234-254
  transform_loss      TransformLoss             loss.py:272-320 (equivariance)
  ce_loss_abstain     CeLossAbstain             loss.py:323-370

Weight gating happens at TRACE time in the bundle (python float == 0.0),
mirroring the reference's zero-weight short-circuit — a disabled
TransformLoss never pays its second backbone forward.

Layout note: similarities are (N, P) with P grouped per class in order
(class0 block, class1 block, ...); occurrence maps are channels-last
(N, [T,] H, W, P).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from protoasnet_tpu.ops.affine import affine_warp_video, rotate_scale_matrix  # noqa: F401 (gather reference path)
from protoasnet_tpu.ops.affine_fast import rotate_scale_video

__all__ = [
    "mse_loss",
    "ce_loss",
    "cluster_patch",
    "separation_patch",
    "cluster_roi",
    "separation_roi",
    "orthogonality_loss",
    "l_norm",
    "l_norm_occurrence",
    "l_norm_fc",
    "sample_affine_params",
    "affine_batch",
    "transform_loss",
    "transform_loss_from_pair",
    "ce_loss_abstain",
]

_EPS = 1e-8


def _reduce_rows(per_row: jnp.ndarray, reduction: str,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference reduction convention on (N, K) matrices:
    'mean' -> mean over batch then sum over classes; 'sum' -> sum of all.
    ``valid`` masks padding rows (mean divides by the valid count)."""
    if valid is not None:
        per_row = per_row * valid[:, None]
        if reduction == "mean":
            return per_row.sum(axis=0).sum() / jnp.maximum(valid.sum(), 1)
        if reduction == "sum":
            return per_row.sum()
    if reduction == "mean":
        return per_row.mean(axis=0).sum()
    if reduction == "sum":
        return per_row.sum()
    raise ValueError(f"Unknown reduction {reduction!r}")


def mse_loss(pred, target, reduction: str = "mean"):
    se = (pred - target) ** 2
    return se.mean() if reduction == "mean" else se.sum()


def ce_loss(logits, target, reduction: str = "mean",
            valid: Optional[jnp.ndarray] = None):
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
    if valid is not None:
        nll = nll * valid
        return nll.sum() / jnp.maximum(valid.sum(), 1) if reduction == "mean" else nll.sum()
    return nll.mean() if reduction == "mean" else nll.sum()


def _grouped(per_proto: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    n, p = per_proto.shape
    return per_proto.reshape(n, num_classes, p // num_classes)


def cluster_patch(min_distances, target, num_classes: int, reduction: str = "mean",
                  valid: Optional[jnp.ndarray] = None):
    """Pull down the min own-class patch distance."""
    one_hot = jax.nn.one_hot(target, num_classes, dtype=min_distances.dtype)
    class_min = _grouped(min_distances, num_classes).min(axis=2)  # (N, K)
    return _reduce_rows(class_min * one_hot, reduction, valid)


def separation_patch(min_distances, target, num_classes: int, reduction: str = "mean",
                     valid: Optional[jnp.ndarray] = None):
    """Push up the min other-class patch distance (note the leading minus)."""
    one_hot = jax.nn.one_hot(target, num_classes, dtype=min_distances.dtype)
    class_min = _grouped(min_distances, num_classes).min(axis=2)
    return -_reduce_rows(class_min * (1.0 - one_hot), reduction, valid)


def cluster_roi(similarities, target, num_classes: int, reduction: str = "mean",
                valid: Optional[jnp.ndarray] = None):
    """-max own-class cosine similarity."""
    one_hot = jax.nn.one_hot(target, num_classes, dtype=similarities.dtype)
    class_max = _grouped(similarities, num_classes).max(axis=2)  # (N, K)
    return _reduce_rows(-class_max * one_hot, reduction, valid)


def separation_roi(similarities, target, num_classes: int,
                   reduction: str = "mean", abstain_class: bool = False,
                   valid: Optional[jnp.ndarray] = None):
    """+max other-class similarity; abstain prototypes exempted by forcing
    the last class's one-hot to 1 (loss.py:169-171)."""
    one_hot = jax.nn.one_hot(target, num_classes, dtype=similarities.dtype)
    if abstain_class:
        one_hot = one_hot.at[:, -1].set(1.0)
    class_max = _grouped(similarities, num_classes).max(axis=2)
    return _reduce_rows(class_max * (1.0 - one_hot), reduction, valid)


def orthogonality_loss(prototype_vectors, num_classes: int, mode: str = "per_class"):
    """Sum of strictly-upper-triangle pairwise cosine similarities between
    prototype vectors, per class group or across all."""
    pv = prototype_vectors.reshape(prototype_vectors.shape[0], -1)  # (P, D)
    norm = jnp.maximum(jnp.linalg.norm(pv, axis=-1, keepdims=True), _EPS)
    unit = pv / norm
    if mode == "per_class":
        p, d = unit.shape
        grouped = unit.reshape(num_classes, p // num_classes, d)
        sim = jnp.einsum("kmd,knd->kmn", grouped, grouped,
                         precision=jax.lax.Precision.HIGHEST)
        m = sim.shape[-1]
        triu = jnp.triu(jnp.ones((m, m), sim.dtype), k=1)
        return (sim * triu[None]).sum()
    if mode == "all":
        sim = unit @ unit.T
        m = sim.shape[-1]
        triu = jnp.triu(jnp.ones((m, m), sim.dtype), k=1)
        return (sim * triu).sum()
    raise ValueError(f"Unknown orthogonality mode {mode!r}")


def l_norm(tensor, p: int = 1, axis=None, mask=None, reduction: str = "sum"):
    """Lp norm over ``axis`` (None = all), optional elementwise mask, then
    the reference's mean-over-batch-sum / sum reduction."""
    t = tensor if mask is None else tensor * mask
    if p == 1:
        norms = jnp.sum(jnp.abs(t), axis=axis)
    elif p == 2:
        norms = jnp.sqrt(jnp.sum(t * t, axis=axis))
    else:
        norms = jnp.sum(jnp.abs(t) ** p, axis=axis) ** (1.0 / p)
    norms = jnp.atleast_1d(norms)
    if reduction == "mean":
        return norms.mean(axis=0).sum()
    return norms.sum()


def l_norm_occurrence(occ, p: int = 2, reduction: str = "mean"):
    """Occurrence-map norm over its spatial/temporal dims.

    occ channels-last (N, [T,] H, W, P): norm over all middle axes ->
    (N, P), then reference reduction. Matches L_norm(dim=(-3,-2,-1)) on the
    reference's (N, P, 1, T, H, W) layout (Video_XProtoNet_e2e.py:96)."""
    axes = tuple(range(1, occ.ndim - 1))
    return l_norm(occ, p=p, axis=axes, reduction=reduction)


def l_norm_fc(kernel, class_identity, p: int = 1, reduction: str = "sum"):
    """L1 on the readout kernel masked to incorrect-class entries.

    kernel: (P, K) flax layout; class_identity: (P, K). The reference masks
    torch's (K, P) weight with 1 - identity^T (XProtoNet_Base.py:81) —
    identical set of entries."""
    return l_norm(kernel, p=p, axis=None, mask=1.0 - class_identity,
                  reduction=reduction)


def sample_affine_params(rng) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One (angle_deg, scale) draw per call: U(-20, 20) deg, U(0.6, 1.5)
    (reference get_affine_config, loss.py:257-269 — one draw per batch)."""
    k1, k2 = jax.random.split(rng)
    angle = jax.random.uniform(k1, (), minval=-20.0, maxval=20.0)
    scale = jax.random.uniform(k2, (), minval=0.6, maxval=1.5)
    return angle, scale


def affine_batch(batch: jnp.ndarray, angle: jnp.ndarray,
                 scale: jnp.ndarray) -> jnp.ndarray:
    """Rotate+scale every (N, [T,] H, W, C) sample by the same (angle,
    scale), MXU-native (banded matmuls) — the gather-based warp costs
    ~60 ms/step on TPU for the flagship shapes (see ops/affine_fast.py)."""
    if batch.ndim == 5:
        return jax.vmap(lambda clip: rotate_scale_video(clip, angle, scale))(batch)
    return jax.vmap(
        lambda img: rotate_scale_video(img[None], angle, scale)[0]
    )(batch)


def transform_loss_from_pair(
    occ_of_transformed: jnp.ndarray,
    occurrence_map: jnp.ndarray,
    angle: jnp.ndarray,
    scale: jnp.ndarray,
    reduction: str = "mean",
):
    """L1( occ(affine(x)), affine(occ(x)) ) given a precomputed
    occ(affine(x)) — the combined-forward train step stacks x and
    affine(x) into one 2N-batch backbone pass (per-half BN stats) and
    feeds the second half's occurrence map here."""
    transformed_occ = affine_batch(occurrence_map, angle, scale)
    loss = jnp.abs(occ_of_transformed - transformed_occ).sum()
    if reduction == "mean":
        loss = loss / (occurrence_map.shape[0] * occurrence_map.shape[-1])
    return loss


def transform_loss(
    x: jnp.ndarray,
    occurrence_map: jnp.ndarray,
    occ_fn: Callable[[jnp.ndarray], jnp.ndarray],
    rng,
    reduction: str = "mean",
):
    """Equivariance regularizer: L1( occ(affine(x)), affine(occ(x)) ).

    x: (N, [T,] H, W, C) input clip; occurrence_map: (N, [T',] H', W', P);
    occ_fn: second forward through backbone+occurrence module (same params).
    The same rotation+scale applies in input space and occurrence space
    (resolution-independent, centered per resolution).
    """
    angle, scale = sample_affine_params(rng)
    x_t = affine_batch(x, angle, scale)
    occ_of_transformed = occ_fn(x_t)
    return transform_loss_from_pair(occ_of_transformed, occurrence_map,
                                    angle, scale, reduction)


def ce_loss_abstain(
    logits,
    target,
    ab_weight: float = 0.3,
    ab_logitpath: str = "joined",
    reduction: str = "mean",
    valid: Optional[jnp.ndarray] = None,
):
    """Abstention loss (reference CeLossAbstain, loss.py:323-370):
    virtual_pred = (1-a) * softmax(class logits) + a * onehot(target), with
    a = softmax (joined) or sigmoid (separate) of the K+1-th logit; NLL on
    log(virtual_pred) plus ab_weight * -log(1 - a)."""
    k = logits.shape[-1] - 1
    if k < 2:
        raise ValueError("ce_loss_abstain needs >= 2 classes excluding abstention")
    if ab_logitpath == "joined":
        abs_pred = jax.nn.softmax(logits, axis=-1)[:, k]
    elif ab_logitpath == "separate":
        abs_pred = jax.nn.sigmoid(logits[:, k])
    else:
        raise ValueError(f"Unknown ab_logitpath {ab_logitpath!r}")
    class_pred = jax.nn.softmax(logits[:, :k], axis=-1)
    one_hot = jax.nn.one_hot(target, k, dtype=logits.dtype)
    virtual = (1.0 - abs_pred[:, None]) * class_pred + abs_pred[:, None] * one_hot
    per_sample_pred = -jnp.log(
        jnp.maximum(jnp.take_along_axis(virtual, target[:, None], axis=-1)[:, 0], _EPS)
    )
    per_sample_abs = -jnp.log(jnp.maximum(1.0 - abs_pred, _EPS))
    if valid is not None:
        per_sample_pred = per_sample_pred * valid
        per_sample_abs = per_sample_abs * valid
        denom = jnp.maximum(valid.sum(), 1)
        if reduction == "mean":
            return per_sample_pred.sum() / denom + ab_weight * per_sample_abs.sum() / denom
        return per_sample_pred.sum() + ab_weight * per_sample_abs.sum()
    if reduction == "mean":
        return per_sample_pred.mean() + ab_weight * per_sample_abs.mean()
    return per_sample_pred.sum() + ab_weight * per_sample_abs.sum()
