"""Config-driven loss bundle for the train/eval steps.

Wires the criterion config section (e.g. Ours_ProtoASNet_Video.yml:31-58)
into one call producing the 7-term XProtoNet objective
(Video_XProtoNet_e2e.run_epoch:86-110) or the ProtoPNet objective
(ProtoPNet_Base.get_criterion:60-75). Zero-weight terms are skipped at
trace time, so e.g. a disabled TransformLoss costs nothing.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp

from protoasnet_tpu.losses import losses as L

__all__ = ["LossBundle"]


class LossBundle:
    """Stateless; holds only config floats resolved at build time."""

    def __init__(self, criterion_cfg: Dict[str, Any], num_classes: int,
                 abstain_class: bool, variant: str = "xprotonet"):
        self.cfg = criterion_cfg
        self.num_classes = num_classes
        self.abstain_class = abstain_class
        self.variant = variant  # "xprotonet" | "protopnet"

    def _w(self, name: str, key: str = "loss_weight") -> float:
        return float(self.cfg.get(name, {}).get(key, 0.0))

    @property
    def transform_enabled(self) -> bool:
        """True when the TransformLoss term is active (nonzero weight) —
        the train step then folds its second forward into the main
        backbone dispatch."""
        return self._w("trans_occurrence") != 0.0

    def _red(self, name: str, default: str = "mean") -> str:
        return self.cfg.get(name, {}).get("reduction", default)

    def xprotonet_terms(
        self,
        logits: jnp.ndarray,
        similarities: jnp.ndarray,
        occurrence_map: jnp.ndarray,
        target: jnp.ndarray,
        prototype_vectors: jnp.ndarray,
        fc_kernel: jnp.ndarray,
        class_identity: jnp.ndarray,
        x: Optional[jnp.ndarray] = None,
        occ_fn: Optional[Callable] = None,
        rng=None,
        valid: Optional[jnp.ndarray] = None,
        occ_transformed: Optional[jnp.ndarray] = None,
        affine_params: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """The 7-term ProtoASNet objective. Returns (total, terms dict with
        the reference's wandb log names)."""
        zero = jnp.float32(0.0)
        terms: Dict[str, jnp.ndarray] = {}

        # classification
        if self.abstain_class:
            c = self.cfg.get("CeLossAbstain", {})
            w = float(c.get("loss_weight", 1.0))
            ce = w * L.ce_loss_abstain(
                logits, target,
                ab_weight=float(c.get("ab_weight", 0.3)),
                ab_logitpath=c.get("ab_logitpath", "joined"),
                reduction=c.get("reduction", "mean"),
                valid=valid,
            ) if w else zero
        else:
            c = self.cfg.get("CeLoss", {})
            w = float(c.get("loss_weight", 1.0))
            ce = w * L.ce_loss(logits, target, reduction=c.get("reduction", "mean"),
                               valid=valid) if w else zero
        terms["loss_CE"] = ce

        w = self._w("ClusterRoiFeat")
        terms["loss_Clst"] = w * L.cluster_roi(
            similarities, target, self.num_classes, self._red("ClusterRoiFeat"),
            valid=valid,
        ) if w else zero

        w = self._w("SeparationRoiFeat")
        terms["loss_Sep"] = w * L.separation_roi(
            similarities, target, self.num_classes, self._red("SeparationRoiFeat"),
            abstain_class=self.abstain_class, valid=valid,
        ) if w else zero

        w = self._w("OrthogonalityLoss")
        terms["loss_Ortho"] = w * L.orthogonality_loss(
            prototype_vectors, self.num_classes,
            mode=self.cfg.get("OrthogonalityLoss", {}).get("mode", "per_class"),
        ) if w else zero

        w = self._w("Lnorm_occurrence")
        terms["loss_RoiNorm"] = w * L.l_norm_occurrence(
            occurrence_map,
            p=int(self.cfg.get("Lnorm_occurrence", {}).get("p", 2)),
            reduction=self._red("Lnorm_occurrence"),
        ) if w else zero

        w = self._w("trans_occurrence")
        if w and occ_transformed is not None and affine_params is not None:
            # combined-forward path: occ(affine(x)) came out of the same
            # 2N-batch backbone dispatch as the main forward (train/steps.py)
            terms["loss_RoiTrans"] = w * L.transform_loss_from_pair(
                occ_transformed, occurrence_map, *affine_params,
                reduction=self._red("trans_occurrence"),
            )
        elif w and occ_fn is not None and x is not None and rng is not None:
            terms["loss_RoiTrans"] = w * L.transform_loss(
                x, occurrence_map, occ_fn, rng,
                reduction=self._red("trans_occurrence"),
            )
        else:
            terms["loss_RoiTrans"] = zero

        w = self._w("Lnorm_FC")
        terms["loss_fcL1Norm"] = w * L.l_norm_fc(
            fc_kernel, class_identity,
            p=int(self.cfg.get("Lnorm_FC", {}).get("p", 1)),
            reduction=self.cfg.get("Lnorm_FC", {}).get("reduction", "sum"),
        ) if w else zero

        total = sum(terms.values())
        return total, terms

    def protopnet_terms(
        self,
        logits: jnp.ndarray,
        min_distances: jnp.ndarray,
        target: jnp.ndarray,
        fc_kernel: jnp.ndarray,
        class_identity: jnp.ndarray,
        valid: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """CE + ClusterPatch + SeparationPatch + L1(FC) (ProtoPNet agents)."""
        zero = jnp.float32(0.0)
        terms: Dict[str, jnp.ndarray] = {}

        c = self.cfg.get("CeLoss", {})
        w = float(c.get("loss_weight", 1.0))
        terms["loss_CE"] = w * L.ce_loss(
            logits, target, reduction=c.get("reduction", "mean"), valid=valid
        ) if w else zero

        w = self._w("ClusterPatch")
        terms["loss_Clst"] = w * L.cluster_patch(
            min_distances, target, self.num_classes, self._red("ClusterPatch"),
            valid=valid,
        ) if w else zero

        w = self._w("SeparationPatch")
        terms["loss_Sep"] = w * L.separation_patch(
            min_distances, target, self.num_classes, self._red("SeparationPatch"),
            valid=valid,
        ) if w else zero

        w = self._w("Lnorm_FC")
        terms["loss_fcL1Norm"] = w * L.l_norm_fc(
            fc_kernel, class_identity,
            p=int(self.cfg.get("Lnorm_FC", {}).get("p", 1)),
            reduction=self.cfg.get("Lnorm_FC", {}).get("reduction", "sum"),
        ) if w else zero

        total = sum(terms.values())
        return total, terms
