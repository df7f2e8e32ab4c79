"""Per-video aggregation of the per-interval prediction CSVs.

Eval iterates EVERY sub-clip of every video (interval semantics,
as_dataloader.py:45-48) and writes one row per interval
(create_pred_log_df). The reference leaves the per-video aggregation to
downstream analysis; this utility performs the standard reduction: mean
softmax probability across a video's intervals (abstain logit stripped),
argmax for the video-level prediction, plus video-level metrics.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
import pandas as pd

__all__ = ["aggregate_predictions"]


def aggregate_predictions(
    csv_or_df: Union[str, pd.DataFrame],
    abstain_class: bool = False,
) -> Tuple[pd.DataFrame, dict]:
    """Returns (per-video DataFrame, metrics dict).

    Expects the pred-log columns: filename, target_AS, logit_<name>...
    """
    df = pd.read_csv(csv_or_df) if isinstance(csv_or_df, str) else csv_or_df
    logit_cols = [c for c in df.columns if c.startswith("logit_")]
    if abstain_class or (logit_cols and logit_cols[-1] == "logit_abstain"):
        class_cols = [c for c in logit_cols if c != "logit_abstain"]
    else:
        class_cols = logit_cols
    logits = df[class_cols].to_numpy(dtype=np.float64)
    z = logits - logits.max(axis=1, keepdims=True)
    probs = np.exp(z) / np.exp(z).sum(axis=1, keepdims=True)
    for i, c in enumerate(class_cols):
        df = df.assign(**{c.replace("logit_", "prob_"): probs[:, i]})
    prob_cols = [c.replace("logit_", "prob_") for c in class_cols]

    agg = df.groupby("filename").agg(
        target_AS=("target_AS", "first"),
        n_intervals=("target_AS", "size"),
        **{c: (c, "mean") for c in prob_cols},
    ).reset_index()
    video_probs = agg[prob_cols].to_numpy()
    agg["pred_AS"] = video_probs.argmax(axis=1)

    y = agg["target_AS"].to_numpy()
    pred = agg["pred_AS"].to_numpy()
    metrics = {"n_videos": len(agg)}
    try:
        from sklearn.metrics import balanced_accuracy_score, f1_score, roc_auc_score

        labels = list(range(len(prob_cols)))
        metrics["balanced_accuracy"] = float(balanced_accuracy_score(y, pred))
        metrics["f1_mean"] = float(f1_score(y, pred, average="macro",
                                            labels=labels, zero_division=0))
        try:
            auc = roc_auc_score(y, video_probs, average="weighted",
                                multi_class="ovr", labels=labels)
            metrics["AUC"] = float(auc) if np.isfinite(auc) else 0.0
        except ValueError:
            metrics["AUC"] = 0.0
    except ImportError:
        pass
    return agg, metrics
