"""CSV manifest of echo cine loops.

Schema parity with the reference dataset CSV
(/root/reference/src/data/as_dataloader.py:89-119):
``path, view, split, as_label, frames, frame_time, heart_rate``.

``as_label`` is an integer class id into CLASS_LABELS (+ optional learned
abstain class appended by the model, not present in data).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd

from protoasnet_tpu.data.intervals import IntervalTable, compute_intervals

CLASS_LABELS = ["No AS", "Early AS", "Significant AS"]

__all__ = ["Manifest", "CLASS_LABELS"]

_REQUIRED = ["path", "view", "split", "as_label", "frames", "frame_time", "heart_rate"]


@dataclass
class Manifest:
    """Filtered view of the dataset CSV plus interval metadata."""

    df: pd.DataFrame
    window_size: np.ndarray = field(default=None)  # (V,) frames per window
    num_intervals: np.ndarray = field(default=None)
    intervals: IntervalTable = field(default=None)

    @classmethod
    def from_csv(
        cls,
        data_info_file: str,
        view: str = "plax",
        split: str = "train",
        sample_size: Optional[int] = None,
        interval_unit: str = "cycle",
        interval_quant: float = 1.0,
        seed: int = 0,
    ) -> "Manifest":
        df = pd.read_csv(data_info_file)
        missing = [c for c in _REQUIRED if c not in df.columns]
        if missing:
            raise ValueError(f"Manifest {data_info_file} missing columns: {missing}")

        if view in ("plax", "psax"):
            df = df[df["view"] == view]
        elif view != "all":
            raise ValueError(f"View should be plax/psax/all, got {view}")

        if split in ("train", "val", "test"):
            df = df[df["split"] == split]
        elif split != "all":
            raise ValueError(f"Split should be train/val/test/all, got {split}")

        if sample_size is not None:
            df = df.sample(sample_size, random_state=seed)
        df = df.reset_index(drop=True)

        window, n_int, table = compute_intervals(
            df["frames"].to_numpy(),
            df["frame_time"].to_numpy(),
            df["heart_rate"].to_numpy(),
            interval_unit,
            interval_quant,
        )
        return cls(df=df, window_size=window, num_intervals=n_int, intervals=table)

    def __len__(self) -> int:
        return len(self.df)

    @property
    def labels(self) -> np.ndarray:
        return self.df["as_label"].to_numpy().astype(np.int32)

    @property
    def paths(self) -> np.ndarray:
        return self.df["path"].to_numpy()

    @property
    def filenames(self) -> np.ndarray:
        return np.array([os.path.basename(p) for p in self.df["path"]])

    @property
    def frames(self) -> np.ndarray:
        return self.df["frames"].to_numpy().astype(np.int64)

    def class_sample_weights(self) -> np.ndarray:
        """Inverse-frequency weight per row for AS-balanced sampling
        (parity with class_sampler_AS, as_dataloader.py:136-145)."""
        labels = self.labels
        counts = np.bincount(labels, minlength=int(labels.max()) + 1).astype(np.float64)
        weights = np.zeros_like(counts)
        nz = counts > 0
        weights[nz] = 1.0 / counts[nz]
        return weights[labels]
