"""Experiment tracking sinks.

The reference threads wandb through every loop (base.py:62-88,
Video_XProtoNet_e2e.py:193-218,322-359). Here tracking is a small
interface with three backends:

* ``jsonl``  — append metric dicts to {save_dir}/metrics.jsonl (default;
  works offline, greppable, no deps)
* ``wandb``  — used when the wandb package is installed and
  wandb_mode != disabled (keeps the reference's config surface)
* ``disabled`` — no-op

Batch/epoch log keys mirror the reference (batch_{mode}/..., epoch/{mode}/...).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict

__all__ = ["Tracker", "make_tracker"]


class Tracker:
    def log(self, data: Dict[str, Any]) -> None:  # pragma: no cover
        raise NotImplementedError

    def finish(self) -> None:
        pass


class DisabledTracker(Tracker):
    def log(self, data: Dict[str, Any]) -> None:
        pass


class JsonlTracker(Tracker):
    def __init__(self, save_dir: str, run_name: str = ""):
        os.makedirs(save_dir, exist_ok=True)
        self.path = os.path.join(save_dir, "metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self.t0 = time.time()

    def log(self, data: Dict[str, Any]) -> None:
        row = {"_t": round(time.time() - self.t0, 3)}
        for k, v in data.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = str(v)
        self._f.write(json.dumps(row) + "\n")

    def finish(self) -> None:
        self._f.close()


class WandbTracker(Tracker):
    def __init__(self, save_dir: str, run_name: str, mode: str, config: Dict):
        import wandb

        self._wandb = wandb
        wandb.init(project="ProtoASNet-TPU", name=run_name, mode=mode,
                   dir=save_dir, config=config)
        # per-mode step axes + min/max summaries (reference wandb metric
        # definitions, base.py:62-88)
        for m in ("train", "val", "val_push", "test"):
            wandb.define_metric(f"batch_{m}/step")
            wandb.define_metric(f"batch_{m}/*", step_metric=f"batch_{m}/step")
        wandb.define_metric("epoch")
        for m in ("train", "val", "val_push", "test"):
            wandb.define_metric(f"epoch/{m}/f1_mean", step_metric="epoch",
                                summary="max")
            wandb.define_metric(f"epoch/{m}/AUC_mean", step_metric="epoch",
                                summary="max")
            wandb.define_metric(f"epoch/{m}/loss_all", step_metric="epoch",
                                summary="min")

    def log(self, data: Dict[str, Any]) -> None:
        self._wandb.log(data)

    def finish(self) -> None:
        self._wandb.finish()


def make_tracker(config: Dict[str, Any]) -> Tracker:
    mode = config.get("wandb_mode", "disabled")
    save_dir = config.get("save_dir", ".")
    run_name = config.get("run_name", "run")
    if mode == "disabled":
        return JsonlTracker(save_dir, run_name)
    try:
        return WandbTracker(save_dir, run_name, mode, config)
    except ImportError:
        logging.warning("wandb not installed; falling back to JSONL tracker")
        return JsonlTracker(save_dir, run_name)
