"""Epoch metric accumulation.

Parity with the reference metric suite (Video_XProtoNet_e2e.py:112-135,
240-290; metrics.py:8-44):

* balanced accuracy, per-class & mean F1, weighted OVR AUROC
  (ValueError -> 0 fallback), confusion matrix, classification report
* abstain logit stripped before the eval softmax
* sparsity-at-level: mean #prototypes whose normalized similarity cumsum
  reaches the level (0.8)
* diversity: #prototypes appearing in the top-k similarity ranks of more
  than ``threshold`` of samples — top-5 for class prototypes, top-2 for
  abstain prototypes, split derived from class identity (the reference
  hard-codes 30; fixed per SURVEY.md known-bugs).

Heavy predictions stay on device until epoch end; host accumulation is a
few KB per batch.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

__all__ = ["sparsity_count", "EpochMetrics"]


def sparsity_count(similarities: np.ndarray, level: float = 0.8) -> np.ndarray:
    """Per-sample count of top prototypes explaining ``level`` of the
    similarity mass (INSightR sparsity, reference metrics.py:15-27)."""
    sims = np.asarray(similarities, dtype=np.float64)
    norm = sims / np.maximum(sims.sum(axis=1, keepdims=True), 1e-12)
    srt = -np.sort(-norm, axis=1)
    cumsum = np.cumsum(srt, axis=1)
    return (cumsum >= level).argmax(axis=1)


class EpochMetrics:
    """Accumulates per-batch outputs; computes the epoch summary."""

    def __init__(self, num_classes: int, abstain_class: bool,
                 num_prototypes: int, class_labels: Optional[List[str]] = None,
                 sparsity_level: float = 0.8, diversity_topk: int = 5,
                 diversity_topk_abstain: int = 2, diversity_threshold: float = 0.05):
        self.num_classes = num_classes  # logits dim (incl. abstain if any)
        self.abstain_class = abstain_class
        self.eval_classes = num_classes - 1 if abstain_class else num_classes
        self.class_labels = class_labels or [str(i) for i in range(self.eval_classes)]
        self.num_prototypes = num_prototypes
        self.n_class_protos = (
            num_prototypes // num_classes * self.eval_classes
            if abstain_class else num_prototypes
        )
        self.sparsity_level = sparsity_level
        self.div_topk = diversity_topk
        self.div_topk_ab = diversity_topk_abstain
        self.div_threshold = diversity_threshold
        self.reset()

    def reset(self):
        self.y_true: List[np.ndarray] = []
        self.y_prob: List[np.ndarray] = []
        self.loss_sums: Dict[str, float] = {}
        self.n_batches = 0
        self.sparsity_sum = 0.0
        self.sparsity_n = 0
        self.count_array = np.zeros(self.num_prototypes)
        self.simscore_cumsum = np.zeros(self.num_prototypes)

    @staticmethod
    def _softmax(x: np.ndarray) -> np.ndarray:
        z = x - x.max(axis=1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=1, keepdims=True)

    def update(self, logits, target, valid=None, similarities=None,
               loss_terms: Optional[Dict[str, float]] = None) -> Dict[str, float]:
        """Accumulate one batch; returns quick per-batch stats for logging."""
        # float32: sklearn rejects ml_dtypes.bfloat16 arrays (bf16 models)
        logits = np.asarray(logits).astype(np.float32)
        target = np.asarray(target)
        if similarities is not None:
            similarities = np.asarray(similarities).astype(np.float32)
        if valid is not None:
            v = np.asarray(valid).astype(bool)
            logits, target = logits[v], target[v]
            similarities = None if similarities is None else similarities[v]
        if self.abstain_class:
            probs = self._softmax(logits[:, : self.eval_classes])
        else:
            probs = self._softmax(logits)
        self.y_true.append(target)
        self.y_prob.append(probs)

        if loss_terms:
            for k, val in loss_terms.items():
                self.loss_sums[k] = self.loss_sums.get(k, 0.0) + float(val)
        self.n_batches += 1

        batch_stats: Dict[str, float] = {}
        if similarities is not None and len(similarities):
            sims = np.asarray(similarities)
            counts = sparsity_count(sims, self.sparsity_level)
            self.sparsity_sum += counts.sum()
            self.sparsity_n += len(counts)
            batch_stats["sparsity"] = float(counts.mean())
            # diversity ranks
            nc = self.n_class_protos
            order = np.argsort(-sims[:, :nc], axis=1)[:, : self.div_topk]
            np.add.at(self.count_array[:nc], order.reshape(-1), 1)
            if self.abstain_class and nc < self.num_prototypes:
                order_ab = np.argsort(-sims[:, nc:], axis=1)[:, : self.div_topk_ab]
                np.add.at(self.count_array[nc:], order_ab.reshape(-1), 1)
            self.simscore_cumsum += sims.sum(axis=0)

        if len(target):
            from sklearn.metrics import balanced_accuracy_score, f1_score

            pred = probs.argmax(axis=1)
            batch_stats["accuracy"] = balanced_accuracy_score(target, pred)
            batch_stats["f1_mean"] = f1_score(
                target, pred, average="macro",
                labels=range(self.eval_classes), zero_division=0,
            )
        return batch_stats

    def compute(self) -> Dict[str, object]:
        from sklearn.metrics import (
            balanced_accuracy_score,
            classification_report,
            confusion_matrix,
            f1_score,
            roc_auc_score,
        )

        y_true = np.concatenate(self.y_true) if self.y_true else np.zeros(0, np.int32)
        y_prob = np.concatenate(self.y_prob) if self.y_prob else np.zeros(
            (0, self.eval_classes)
        )
        y_pred = y_prob.argmax(axis=1) if len(y_prob) else np.zeros(0, np.int32)
        labels = list(range(self.eval_classes))

        accu = balanced_accuracy_score(y_true, y_pred) if len(y_true) else 0.0
        f1 = (f1_score(y_true, y_pred, average=None, labels=labels, zero_division=0)
              if len(y_true) else np.zeros(self.eval_classes))
        try:
            auc = roc_auc_score(y_true, y_prob, average="weighted",
                                multi_class="ovr", labels=labels)
            if not np.isfinite(auc):  # single-class y_true yields nan
                auc = 0.0
        except ValueError:
            auc = 0.0

        n = max(len(y_true), 1)
        nc = self.n_class_protos
        diversity = int(np.sum(self.count_array[:nc] > self.div_threshold * n))
        diversity_abstain = (
            int(np.sum(self.count_array[nc:] > self.div_threshold * n))
            if self.abstain_class else 0
        )
        out: Dict[str, object] = {
            "accuracy": float(accu),
            "f1": f1,
            "f1_mean": float(f1.mean()),
            "AUC": float(auc),
            "confusion_matrix": confusion_matrix(y_true, y_pred, labels=labels),
            "sparsity": (self.sparsity_sum / self.sparsity_n
                         if self.sparsity_n else 0.0),
            "diversity": diversity,
            "diversity_abstain": diversity_abstain,
            "losses": {k: v / max(self.n_batches, 1)
                       for k, v in self.loss_sums.items()},
            "y_true": y_true,
            "y_prob": y_prob,
            "y_pred": y_pred,
        }
        if len(y_true):
            out["report"] = classification_report(
                y_true, y_pred, zero_division=0,
                labels=labels, target_names=self.class_labels,
            )
        return out
