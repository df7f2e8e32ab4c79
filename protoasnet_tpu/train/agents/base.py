"""Base agent: model/state construction, dataloaders, checkpointing, logging.

Capability parity with the reference BaseAgent (src/agents/base.py:23-229)
in functional-JAX form: the "model" is (module, TrainState) and every
epoch runs jitted steps; checkpoints are flax-serialized pytrees
({epoch, iteration, params, batch_stats, opt_state(s), best_metric} —
the torch {epoch, iteration, state_dict, optimizer} equivalent).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import pandas as pd

from protoasnet_tpu.data.dataset import get_as_dataloader
from protoasnet_tpu.data.manifest import CLASS_LABELS
from protoasnet_tpu.models.builder import build_model, example_input, init_model
from protoasnet_tpu.parallel import (make_mesh,
                                     maybe_initialize_distributed,
                                     shard_batch)
from protoasnet_tpu.tracking import make_tracker
from protoasnet_tpu.train.metrics import EpochMetrics
from protoasnet_tpu.utils.io import load_checkpoint, save_checkpoint

__all__ = ["BaseAgent", "resolve_loader_batch_sizes"]


def resolve_loader_batch_sizes(dl_cfg: Dict[str, Any],
                               train_cfg: Dict[str, Any],
                               num_devices: int) -> Dict[str, Any]:
    """Resolve train/eval/push batch sizes onto ``dl_cfg``, in place.

    Batches shard over the mesh, so every size is rounded up to a device
    multiple (padding rows carry valid=False and are masked everywhere).
    eval_batch_size is touched only when one is actually in play — an
    explicit config value, or image mode's reference eval-150 default
    (dataset.py): unconditionally inserting the rounded default used to
    silently flip VIDEO eval to batch 152 on multi-device meshes once
    video eval started honoring eval_batch_size — on the 8-virtual-device
    CPU test mesh that meant a half-hour batch-152 eval compile in the
    agent suite, and a parity break (video eval defaults to the train
    batch, MIGRATION.md §2). push follows get_as_dataloader's precedence
    (push_batch_size > eval_batch_size > max(batch, 32) — push is
    forward-only and rides the serving batch, measured 1.34x at 128,
    experiments/push_batch_ab.py).
    """
    nd = num_devices
    bsz = int(train_cfg.get("batch_size", dl_cfg.get("batch_size", 8)))
    if bsz % nd:
        bsz = -(-bsz // nd) * nd
        logging.info(f"batch_size rounded up to {bsz} for {nd}-device mesh")
    dl_cfg["batch_size"] = bsz
    if "eval_batch_size" in dl_cfg or int(dl_cfg.get("frames", 32)) == 1:
        ebsz = int(dl_cfg.get("eval_batch_size", 150))
        if ebsz % nd:
            dl_cfg["eval_batch_size"] = -(-ebsz // nd) * nd
    pbsz = int(dl_cfg.get("push_batch_size")
               or dl_cfg.get("eval_batch_size") or max(bsz, 32))
    dl_cfg["push_batch_size"] = -(-pbsz // nd) * nd
    return dl_cfg


class BaseAgent:
    def __init__(self, config: Dict[str, Any]):
        self.config = config
        self.model_config = dict(config["model"])
        self.train_config = config["train"]
        self.data_config = dict(config["data"])
        self.abstain_class = bool(config.get("abstain_class", False))
        self.save_dir = config.get("save_dir", ".")

        # model (img_size comes from the data section, reference parity)
        self.model_config.setdefault("img_size", self.data_config.get("img_size", 224))
        self.model = build_model(self.model_config)
        sample = example_input(self.model_config, self.data_config, batch_size=1)
        # initial variables; subclasses move these into TrainState and expose
        # live values via .params/.batch_stats properties
        self._params0, self._bstats0 = init_model(
            self.model, sample, seed=int(self.train_config.get("seed", 0))
        )
        if self.model_config.get("pretrained", False):
            from protoasnet_tpu.models.torch_import import load_pretrained_backbone

            self._params0, self._bstats0 = load_pretrained_backbone(
                self._params0, self._bstats0, self.model_config
            )
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self._params0))
        logging.info(f"model {self.model_config['name']}: {n_params / 1e6:.2f}M params")

        # devices / mesh (data-parallel over all visible chips; on a
        # multi-host pod the coordinator handshake must precede mesh
        # construction — no-op on one host)
        if maybe_initialize_distributed():
            logging.info(
                f"distributed: process {jax.process_index()} of "
                f"{jax.process_count()}")
        self.mesh = make_mesh()
        self.num_devices = int(self.mesh.devices.size)
        logging.info(f"mesh: {self.num_devices} device(s): {self.mesh}")

        # data
        self._store_cache: Dict[str, Any] = {}
        seed = int(self.train_config.get("seed", 0))
        dl_cfg = resolve_loader_batch_sizes(
            dict(self.data_config), self.train_config, self.num_devices)
        self.data_loaders = {
            "train": get_as_dataloader(dl_cfg, "train", "train", seed,
                                       self._store_cache),
            "val": get_as_dataloader(dl_cfg, "val", "val", seed, self._store_cache),
            "test": get_as_dataloader(dl_cfg, "test", "test", seed,
                                      self._store_cache),
            "train_push": get_as_dataloader(dl_cfg, "train", "push", seed,
                                            self._store_cache),
        }

        self.tracker = make_tracker(config)
        self.class_labels = list(CLASS_LABELS)

        self.current_epoch = 0
        self.current_iteration = 0
        self.best_metric = 0.0
        self.rng = jax.random.PRNGKey(int(self.train_config.get("seed", 0)))

    # ---------------- helpers ----------------

    def next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def make_metrics(self) -> EpochMetrics:
        return EpochMetrics(
            num_classes=int(self.model_config["num_classes"]),
            abstain_class=self.abstain_class,
            num_prototypes=self.model.num_prototypes,
            class_labels=self.class_labels,
        )

    def shard(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        if self.num_devices > 1:
            return shard_batch(self.mesh, batch)
        return batch

    @property
    def logit_names(self):
        names = list(self.class_labels)
        if self.abstain_class:
            names.append("abstain")
        return names

    def create_pred_log_df(self, batch, logits: np.ndarray) -> pd.DataFrame:
        """Per-sample prediction rows (reference create_pred_log_df,
        base.py:195-211), restricted to valid (non-padding) samples."""
        v = np.asarray(batch["valid"]).astype(bool)
        data = {
            "filename": [f for f, ok in zip(batch["filename"], v) if ok],
            "target_AS": np.asarray(batch["target_AS"])[v],
            "interval_idx": np.asarray(batch["interval_idx"])[v],
            "window_start": np.asarray(batch["window_start"])[v],
            "window_end": np.asarray(batch["window_end"])[v],
            "original_length": np.asarray(batch["original_length"])[v],
        }
        # float32: pandas cannot hold ml_dtypes.bfloat16 columns
        logits = np.asarray(logits).astype(np.float32)[v]
        for i, name in enumerate(self.logit_names):
            data[f"logit_{name}"] = logits[:, i]
        return pd.DataFrame(data)

    # ---------------- checkpointing ----------------

    def get_state(self) -> Dict[str, Any]:
        raise NotImplementedError

    def set_state(self, state: Dict[str, Any]) -> None:
        raise NotImplementedError

    def save_checkpoint(self, is_best: bool = False) -> None:
        if not self.train_config.get("save", True):
            return
        self._ensure_config_dump()
        state = self.get_state()
        save_step = self.train_config.get("save_step")
        if save_step is not None and self.current_epoch % int(save_step) == 0:
            save_checkpoint(state, os.path.join(
                self.save_dir, f"epoch_{self.current_epoch}.ckpt"))
        if is_best:
            save_checkpoint(state, os.path.join(self.save_dir, "model_best.ckpt"))
        save_checkpoint(state, os.path.join(self.save_dir, "last.ckpt"))

    def _ensure_config_dump(self) -> None:
        """Make every saved run dir self-describing: serve.py's
        load_trained_agent (export / live daemon) rebuilds the agent from
        {save_dir}/config_*.yml. The CLIs dump one up front (main.py,
        reference main.py:31-38 convention); library-API runs
        (build_agent(...).train()) would otherwise produce a run dir that
        the deployment tools cannot consume."""
        import glob

        if glob.glob(os.path.join(self.save_dir, "config_*.yml")):
            return
        try:
            from protoasnet_tpu.utils.config import dump_config

            dump_config(self.config,
                        os.path.join(self.save_dir, "config_agent.yml"))
        except Exception as e:  # noqa: BLE001 — e.g. a caller smuggled a
            # non-YAML-safe object into config; never fail a checkpoint
            # save over the convenience dump
            logging.warning(f"could not dump config to run dir: {e}")

    def save_model_w_condition(self, model_name: str, metric: float,
                               threshold: float) -> None:
        if metric > threshold:
            save_checkpoint(self.get_state(), os.path.join(
                self.save_dir, f"{model_name}_f1-{metric:.4f}.ckpt"))

    def load_checkpoint_file(self, path: Optional[str]) -> None:
        """Load an explicit checkpoint, or — with train.auto_resume (default
        on) — fall back to {save_dir}/last.ckpt so preempted runs restarted
        with the same save_dir continue where they stopped (the reference
        resumes only via an explicit model.checkpoint_path)."""
        if not path and self.train_config.get("auto_resume", True):
            candidate = os.path.join(self.save_dir, "last.ckpt")
            if os.path.exists(candidate):
                path = candidate
                logging.info(f"auto-resume from {candidate}")
        if not path:
            return
        if not os.path.exists(path):
            logging.info(f"No checkpoint at {path!r}; training from scratch")
            return
        try:
            if path.endswith((".pkl", ".pickle")):
                # migrated reference checkpoint (models/migrate.py): params +
                # batch_stats only; optimizer state starts fresh
                from protoasnet_tpu.utils.io import load_pickle

                blob = load_pickle(path)
                state = self.get_state()
                state["params"] = jax.tree_util.tree_map(
                    lambda ref, new: np.asarray(new, dtype=ref.dtype),
                    state["params"], blob["params"])
                state["batch_stats"] = jax.tree_util.tree_map(
                    lambda ref, new: np.asarray(new, dtype=ref.dtype),
                    state["batch_stats"], blob["batch_stats"])
                state["epoch"] = int(blob.get("epoch", 0))
                state["iteration"] = int(blob.get("iteration", 0))
                self.set_state(state)
                logging.info(f"Migrated reference checkpoint loaded from {path}")
                return
            state = load_checkpoint(path, target=self.get_state())
            self.set_state(state)
            logging.info(
                f"Checkpoint loaded from {path} (epoch {self.current_epoch}, "
                f"iteration {self.current_iteration})"
            )
        except Exception:
            logging.exception(f"Failed to load checkpoint {path}; starting fresh")

    # ---------------- control flow ----------------

    def run(self) -> None:
        try:
            self.train()
        except KeyboardInterrupt:
            logging.info("CTRL+C received — finalizing")

    def train(self) -> None:
        raise NotImplementedError

    def evaluate(self, mode: str = "val"):
        return self.run_epoch(self.current_epoch, mode=mode)

    def run_epoch(self, epoch: int, mode: str = "train"):
        raise NotImplementedError

    def print_model_summary(self) -> None:
        """Per-submodule parameter/shape table (the reference's torchsummary
        print, base.py:227-229 / Video_XProtoNet_e2e.py:363-368)."""
        import flax.linen as nn

        sample = example_input(self.model_config, self.data_config, batch_size=1)
        try:
            table = nn.tabulate(
                self.model, jax.random.PRNGKey(0),
                compute_flops=False, compute_vjp_flops=False,
            )(sample, train=False)
            logging.info("\n" + table)
        except Exception:
            # fallback: flat param-count table
            logging.exception("nn.tabulate failed; printing param counts")
            for top, sub in self.params.items():
                n = sum(x.size for x in jax.tree_util.tree_leaves(sub))
                logging.info(f"  {top}: {n / 1e6:.3f}M params")

    def finalize(self) -> None:
        self.tracker.finish()
