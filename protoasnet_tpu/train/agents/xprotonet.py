"""XProtoNet / ProtoASNet agents (image + video; e2e + staged).

The model is rank-agnostic (see models/xprotonet.py), so ONE e2e agent
covers the reference's XProtoNet_e2e (image) and Video_XProtoNet_e2e
(video) — registered under both names. The staged agent adds the reference
4-step schedule (warm -> joint -> push -> last-only,
XProtoNet_Base.train:169-251) with three independent optimizer states.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from protoasnet_tpu.losses.bundle import LossBundle
from protoasnet_tpu.push.push import push_prototypes
from protoasnet_tpu.train.agents.base import BaseAgent
from protoasnet_tpu.train.optim import (
    GROUPS,
    make_adam,
    make_lr_scheduler,
)
from protoasnet_tpu.train.steps import TrainState, make_xprotonet_steps
from protoasnet_tpu.utils.run import makedir

__all__ = ["XProtoNetE2EAgent", "XProtoNetStagedAgent"]

# config param-group names (reference optimizer specs) -> our group labels
_CFG_GROUP = {
    "cnn_backbone": "backbone",
    "add_on_layers": "add_on",
    "occurrence_module": "occurrence",
    "prototype_vectors": "prototypes",
    "last_layer": "last_layer",
}


class _XProtoNetAgentCommon(BaseAgent):
    """run_epoch / push / evaluate shared by the e2e and staged agents."""

    def _make_bundle(self) -> LossBundle:
        return LossBundle(
            self.train_config["criterion"],
            num_classes=int(self.model_config["num_classes"]),
            abstain_class=self.abstain_class,
        )

    def _clamp_lr(self, base: float, scale: float) -> float:
        """base * scale with torch ReduceLROnPlateau's ABSOLUTE min_lr floor
        (the scheduler here tracks a multiplicative scale, so the config's
        min_lr must clamp the product, not the scale). Groups with base 0
        are not in the reference optimizer at all — no floor for them."""
        lr = base * scale
        if base > 0:
            lr = max(lr, getattr(self, "min_abs_lr", 0.0))
        return lr

    def _epoch_log(self, epoch: int, mode: str, summary: Dict[str, Any],
                   seconds: float) -> None:
        losses = summary["losses"]
        loss_all = losses.get("loss_all", 0.0)
        f1 = summary["f1"]
        logging.info(
            f"Epoch:{epoch}_{mode} | Time:{seconds:.0f}s | Loss:{loss_all:.3f} | "
            f"Acc: {summary['accuracy']:.2%} | "
            f"f1: {[f'{v:.2%}' for v in f1]} | f1_avg: {summary['f1_mean']:.4f} | "
            f"AUC: {summary['AUC']:.4f}\n"
            f"Sparsity: {summary['sparsity']:.2f} | diversity: {summary['diversity']}"
            + (f" | diversity_abstain: {summary['diversity_abstain']}"
               if self.abstain_class else "")
        )
        logging.info(f"Confusion matrix:\n{summary['confusion_matrix']}")
        if "report" in summary:
            logging.info("\n" + summary["report"])
        log = {
            "epoch": epoch,
            f"epoch/{mode}/loss_all": loss_all,
            f"epoch/{mode}/f1_mean": summary["f1_mean"],
            f"epoch/{mode}/accuracy": summary["accuracy"],
            f"epoch/{mode}/AUC_mean": summary["AUC"],
            f"epoch/{mode}/diversity": summary["diversity"],
            f"epoch/{mode}/sparsity": summary["sparsity"],
            "lr": float(self.lr),
        }
        for name, v in losses.items():
            if name != "loss_all":
                log[f"epoch/{mode}/{name}"] = v
        for name, v in zip(self.class_labels, f1):
            log[f"epoch/{mode}/f1_{name}"] = v
        if self.abstain_class:
            log[f"epoch/{mode}/diversity_abstain"] = summary["diversity_abstain"]
        self.tracker.log(log)

    def run_epoch(self, epoch: int, mode: str = "train",
                  optimizer_name: str = "default") -> Tuple[float, float, float]:
        """One pass over the mode's dataloader. Returns (accu, f1_mean, auc)."""
        dataloader_mode = mode.split("_")[0] if "_push" in mode else mode
        loader = self.data_loaders[dataloader_mode]
        loader.set_epoch(epoch)
        metrics = self.make_metrics()
        is_train = mode == "train"
        t0 = time.time()
        epoch_pred_log = []

        train_step, eval_step = self._steps_for(optimizer_name)
        epoch_steps = len(loader)

        import contextlib

        from protoasnet_tpu.utils.profiling import StepTimer, trace

        profile_dir = (self.config.get("profile_dir")
                       or os.environ.get("PROTOASNET_PROFILE_DIR"))
        do_trace = (is_train and profile_dir
                    and epoch == int(self.config.get("profile_epoch", 1)))
        stack = contextlib.ExitStack()
        stack.enter_context(trace(profile_dir if do_trace else None))

        # on-device metric accumulation (TPU-first, SURVEY.md §5.8): outputs
        # scatter into device buffers; ONE host transfer at epoch end.
        # Per-batch tracker rows are skipped in this mode (epoch rows stay).
        # val_push/test keep the host path (pred-log CSVs need per-sample
        # metadata).
        # default ON (measured 1.43x for an eval epoch at batch 128 on the
        # relayed chip: 489 -> 701 clips/s, experiments/device_metrics_ab.py;
        # on a PCIe host the per-batch sync is smaller but still a pipeline
        # break). Set train.on_device_metrics: false for the reference's
        # per-batch host logging behavior.
        on_device = (bool(self.train_config.get("on_device_metrics", True))
                     and mode not in ("val_push", "test"))
        dev_buf = None

        timer = StepTimer()
        it = iter(loader)
        while True:
            with timer.phase("data"):
                batch = next(it, None)
            if batch is None:
                break
            with timer.phase("step"):
                batch = self.shard(batch)
                rng = self.next_rng()
                target = batch.get("target_AS_dev")
                if target is None:
                    target = jnp.asarray(np.asarray(batch["target_AS"]))
                valid = batch.get("valid_dev")
                if valid is None:
                    valid = jnp.asarray(np.asarray(batch["valid"]))
                if is_train:
                    state = self._state_for(optimizer_name)
                    state, m = train_step(state, batch["cine"], target, valid,
                                          rng, self._lrs())
                    self._set_state_for(optimizer_name, state)
                    self.current_iteration += 1
                else:
                    m = eval_step(self.params, self.batch_stats, batch["cine"],
                                  target, valid, rng)

            with timer.phase("host_metrics"):
                if on_device:
                    if dev_buf is None:
                        from protoasnet_tpu.train.device_metrics import (
                            DeviceEpochBuffer,
                        )

                        dev_buf = DeviceEpochBuffer(
                            n_batches=epoch_steps,
                            batch_size=m["logits"].shape[0],
                            num_logits=m["logits"].shape[1],
                            num_prototypes=m["similarities"].shape[1],
                            loss_names=sorted(
                                k for k in m if k.startswith("loss")),
                        )
                    dev_buf.update(m, target, valid)
                    continue
                # host path: ONE device->host sync per step (each transfer
                # through the TPU relay costs a full round trip)
                m = jax.device_get(m)
                loss_terms = {k: float(v) for k, v in m.items()
                              if k.startswith("loss")}
                batch_stats = metrics.update(
                    m["logits"], batch["target_AS"], batch["valid"],
                    similarities=m["similarities"], loss_terms=loss_terms,
                )
                step = epoch * epoch_steps + batch["step"]
                self.tracker.log({
                    f"batch_{mode}/step": step,
                    **{f"batch_{mode}/{k}": v for k, v in loss_terms.items()},
                    **{f"batch_{mode}/{k}": v for k, v in batch_stats.items()},
                })
                if mode in ("val_push", "test"):
                    epoch_pred_log.append(
                        self.create_pred_log_df(batch, np.asarray(m["logits"]))
                    )

        if dev_buf is not None:
            with timer.phase("host_metrics"):
                dev_buf.finalize(metrics)
        stack.close()
        summary = metrics.compute()
        timer.log(prefix=f"{mode} e{epoch} ")
        self._epoch_log(epoch, mode, summary, time.time() - t0)

        if mode in ("val_push", "test") and epoch_pred_log:
            path_to_csv = os.path.join(self.save_dir, f"csv_{mode}")
            makedir(path_to_csv)
            df = pd.concat(epoch_pred_log, axis=0).reset_index(drop=True)
            df.to_csv(os.path.join(
                path_to_csv, f"e{epoch:02d}_f1_{summary['f1_mean']:.0%}.csv"))
            # video-level reduction (mean prob over a video's intervals) —
            # the paper's headline quantity. The reference stops at the
            # per-interval CSV (base.py:195-211); we emit both.
            from protoasnet_tpu.train.aggregate import aggregate_predictions

            video_df, video_metrics = aggregate_predictions(
                df, abstain_class=self.abstain_class)
            video_df.to_csv(os.path.join(
                path_to_csv, f"e{epoch:02d}_video_level.csv"), index=False)
            logging.info(
                "%s e%d video-level (%d videos): %s", mode, epoch,
                video_metrics.get("n_videos", 0),
                {k: round(v, 4) for k, v in video_metrics.items()
                 if k != "n_videos"})
            self.tracker.log({
                f"epoch/{mode}/video_{k}": v
                for k, v in video_metrics.items()})

        return summary["accuracy"], summary["f1_mean"], summary["AUC"]

    # subclasses provide optimizer-specific state plumbing
    def _steps_for(self, name: str):
        raise NotImplementedError

    def _state_for(self, name: str) -> TrainState:
        raise NotImplementedError

    def _set_state_for(self, name: str, state: TrainState) -> None:
        raise NotImplementedError

    def _lrs(self) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    @property
    def params(self):
        return self._state_primary().params

    @property
    def batch_stats(self):
        return self._state_primary().batch_stats

    def _state_primary(self) -> TrainState:
        raise NotImplementedError

    def push(self, replace_prototypes: bool = True) -> None:
        epoch = f"{self.current_epoch}_pushed"
        new_params, _info = push_prototypes(
            self.data_loaders["train_push"],
            self.push_step,
            self.params,
            self.batch_stats,
            class_identity=self.model.class_identity(),
            class_specific=True,
            abstain_class=self.abstain_class,
            root_dir_for_saving_prototypes=os.path.join(self.save_dir, "img"),
            epoch_number=epoch,
            replace_prototypes=replace_prototypes,
            render=bool(self.config.get("render_prototypes", True)),
            shard_fn=self.shard if self.num_devices > 1 else None,
        )
        if replace_prototypes:
            self._replace_params(new_params)

    def _replace_params(self, new_params) -> None:
        raise NotImplementedError

    def get_sim_scores(self, mode: str = "train") -> None:
        """Dump per-sample prototype similarity scores + targets for
        prototype-ranking analysis (reference get_sim_scores,
        XProtoNet_Base.py:613-656; .npz instead of torch .pth)."""
        loader = self.data_loaders[mode.split("_")[0]]
        sims, targets = [], []
        for batch in loader:
            _, dist, _, _ = self.push_step(self.params, self.batch_stats,
                                           batch["cine"])
            v = np.asarray(batch["valid"]).astype(bool)
            sims.append(np.asarray(1.0 - np.asarray(dist))[v])
            targets.append(np.asarray(batch["target_AS"])[v])
        out_dir = os.path.join(self.save_dir, "ranking_prototypes")
        makedir(out_dir)
        np.savez(
            os.path.join(out_dir, f"sim_scores_{mode}_epoch{self.current_epoch}.npz"),
            sim_scores=np.concatenate(sims), targets=np.concatenate(targets),
        )
        logging.info(f"sim scores written to {out_dir}")

    def load_sim_scores(self, epoch: int, mode: str):
        data = np.load(os.path.join(
            self.save_dir, "ranking_prototypes",
            f"sim_scores_{mode}_epoch{epoch}.npz"))
        return data["sim_scores"], data["targets"]

    def explain_local(self, mode: str = "test") -> None:
        from protoasnet_tpu.explain.local import explain_local

        explain_local(self, mode=mode)

    def explain_global(self, mode: str = "test") -> None:
        """Global explanations = the per-prototype artifacts emitted by
        push (the reference's explain_global is an unimplemented stub with
        a broken import, XProtoNet_Base.py:717-732 — here it re-renders
        prototypes from the latest push without replacing)."""
        self.push(replace_prototypes=False)


class XProtoNetE2EAgent(_XProtoNetAgentCommon):
    """End-to-end agent: one Adam over all params
    (reference XProtoNet_e2e / Video_XProtoNet_e2e)."""

    def __init__(self, config: Dict[str, Any]):
        super().__init__(config)
        opt_cfg = self.train_config["optimizer"]
        mode = opt_cfg.get("mode", "lr_same")
        if mode == "lr_same":
            lr = float(opt_cfg["lr_same"])
            self.group_lrs = {g: lr for g in GROUPS}
            wd = {g: 1e-3 for g in GROUPS}  # torch: one group, wd on all
        elif mode == "lr_disjoint":
            spec = opt_cfg["lr_disjoint"]
            self.group_lrs = {_CFG_GROUP[k]: float(v) for k, v in spec.items()}
            wd = {"backbone": 1e-3, "add_on": 1e-3, "occurrence": 1e-3}
        else:
            raise ValueError(f"optimizer mode {mode!r} not valid")
        self.base_lrs = dict(self.group_lrs)
        self.lr = self.group_lrs["prototypes"]

        self.bundle = self._make_bundle()
        self.tx = make_adam(weight_decay_by_group=wd, params=self._params0)
        self.state = TrainState.create(self._params0, self._bstats0, self.tx)
        self._train_step, self._eval_step, self.push_step = make_xprotonet_steps(
            self.model, self.bundle, self.tx,
            accumulation_steps=int(self.train_config.get("accumulation_steps", 1)),
            stage="all",
        )
        sched_cfg = dict(self.train_config.get("lr_schedule",
                                               {"name": "ReduceLROnPlateau"}))
        self.min_abs_lr = float(sched_cfg.pop("min_lr", 0.0))
        # scheduler outputs a SCALE applied to base lrs; min_lr is applied
        # as an absolute floor in _clamp_lr (torch parity)
        self.scheduler = make_lr_scheduler(sched_cfg, initial_lr=1.0)
        self.load_checkpoint_file(self.model_config.get("checkpoint_path"))

    # -- state plumbing
    def _steps_for(self, name: str):
        return self._train_step, self._eval_step

    def _state_for(self, name: str) -> TrainState:
        return self.state

    def _set_state_for(self, name: str, state: TrainState) -> None:
        self.state = state

    def _state_primary(self) -> TrainState:
        return self.state

    def _lrs(self):
        scale = self.scheduler.lr  # scheduler tracks a multiplicative scale
        return {g: jnp.float32(self._clamp_lr(self.base_lrs[g], scale))
                for g in GROUPS}

    def _replace_params(self, new_params) -> None:
        self.state = self.state.replace(params=new_params)

    # -- checkpoint state
    def get_state(self) -> Dict[str, Any]:
        return {
            "epoch": self.current_epoch,
            "iteration": self.current_iteration,
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "acc": self.state.acc,
            "step": self.state.step,
            "best_metric": self.best_metric,
            "lr_scale": self.scheduler.lr,
        }

    def set_state(self, st: Dict[str, Any]) -> None:
        self.current_epoch = int(st["epoch"])
        self.current_iteration = int(st["iteration"])
        self.best_metric = float(st["best_metric"])
        self.scheduler.lr = float(st["lr_scale"])
        self.state = self.state.replace(
            params=st["params"], batch_stats=st["batch_stats"],
            opt_state=st["opt_state"], acc=st["acc"], step=st["step"],
        )

    # -- main loop (reference XProtoNet_e2e.train:109-148)
    def train(self) -> None:
        tc = self.train_config
        for epoch in range(self.current_epoch, int(tc["num_train_epochs"])):
            self.current_epoch = epoch
            self.run_epoch(epoch, mode="train")
            _, mean_f1, _ = self.run_epoch(epoch, mode="val")

            self.lr = self._clamp_lr(self.base_lrs["prototypes"],
                                      self.scheduler.step(mean_f1))

            if epoch == int(tc.get("num_warm_epochs", 0)):
                self.push(replace_prototypes=False)

            if (epoch >= int(tc.get("push_start", 1 << 30))
                    and epoch % int(tc.get("push_rate", 5)) == 0):
                self.push(replace_prototypes=True)
                _, mean_f1, _ = self.run_epoch(epoch, mode="val_push")
                self.save_model_w_condition(f"{epoch}push", mean_f1, 0.65)
                is_best = mean_f1 > self.best_metric
                if is_best:
                    self.best_metric = mean_f1
                    logging.info(f"new best mean_f1 {mean_f1:.4f}")
                self.save_checkpoint(is_best=is_best)

            self.save_checkpoint(is_best=False)

    def train_push_end(self) -> None:
        """Alternative loop: non-replacing pushes during training, replacing
        push only at the end for both last and best checkpoints
        (reference XProtoNet_e2e.train_push_end:150-204)."""
        tc = self.train_config
        for epoch in range(self.current_epoch, int(tc["num_train_epochs"])):
            self.current_epoch = epoch
            self.run_epoch(epoch, mode="train")
            _, mean_f1, _ = self.run_epoch(epoch, mode="val")
            self.save_model_w_condition(f"{epoch}nopush", mean_f1, 0.65)
            is_best = mean_f1 > self.best_metric
            if is_best:
                self.best_metric = mean_f1
            self.save_checkpoint(is_best=is_best)
            self.lr = self._clamp_lr(self.base_lrs["prototypes"],
                                      self.scheduler.step(mean_f1))
            if (epoch >= int(tc.get("push_start", 1 << 30))
                    and epoch % int(tc.get("push_rate", 5)) == 0):
                self.push(replace_prototypes=False)
            self.save_checkpoint(is_best=False)

        logging.info("Projecting prototypes of the last model")
        self.push(replace_prototypes=True)
        _, mean_f1, _ = self.run_epoch(self.current_epoch, mode="val")
        self.save_model_w_condition(f"{self.current_epoch}push_last", mean_f1, 0.5)

        best_path = os.path.join(self.save_dir, "model_best.ckpt")
        if os.path.exists(best_path):
            logging.info("Projecting prototypes of the best model")
            self.load_checkpoint_file(best_path)
            self.push(replace_prototypes=True)
            _, mean_f1, _ = self.run_epoch(self.current_epoch, mode="val")
            self.save_model_w_condition(
                f"{self.current_epoch}push_best", mean_f1, 0.5)


class XProtoNetStagedAgent(_XProtoNetAgentCommon):
    """Staged agent: warm / joint / push / last-only with three optimizers
    (reference XProtoNet_Base.get_optimizer:83-138, train:169-251)."""

    _STAGE_OF = {"warm": "warm", "joint": "joint", "last": "last"}

    def __init__(self, config: Dict[str, Any]):
        super().__init__(config)
        opt_cfg = self.train_config["optimizer"]
        joint = {_CFG_GROUP[k]: float(v)
                 for k, v in opt_cfg.get("joint_lrs", {}).items()}
        warm = {_CFG_GROUP[k]: float(v)
                for k, v in opt_cfg.get("warm_lrs", {}).items()}
        last_lr = float(opt_cfg.get("last_layer_lr", 1e-4))
        # defaults for groups a stage doesn't name
        base = {g: joint.get(g, 1e-4) for g in GROUPS}
        self.stage_lrs = {
            "warm": {**base, **warm,
                     "occurrence": joint.get("occurrence", base["occurrence"])},
            "joint": {**base, **joint},
            "last": {**base, "last_layer": last_lr},
        }
        self.lr = self.stage_lrs["joint"]["prototypes"]
        wd = {"backbone": 1e-3, "add_on": 1e-3, "occurrence": 1e-3}

        self.bundle = self._make_bundle()
        self.tx = make_adam(weight_decay_by_group=wd, params=self._params0)
        accum = int(self.train_config.get("accumulation_steps", 1))
        self._stage_steps = {}
        self._stage_states = {}
        for stage in ("warm", "joint", "last"):
            steps = make_xprotonet_steps(self.model, self.bundle, self.tx,
                                         accumulation_steps=accum, stage=stage)
            self._stage_steps[stage] = steps[:2]
            if stage == "joint":
                self.push_step = steps[2]
            self._stage_states[stage] = None  # lazily share one TrainState
        self.state = TrainState.create(self._params0, self._bstats0, self.tx)
        # separate Adam moments per stage (reference has 3 optimizers)
        self.opt_states = {s: self.tx.init(self._params0)
                           for s in ("warm", "joint", "last")}
        # per-stage COPIES: the donated train step would otherwise delete
        # the shared accumulator arrays out from under the inactive
        # stages' entries (see ProtoPNetStagedAgent.__init__ rationale)
        self.accs = {s: jax.tree_util.tree_map(jnp.array, self.state.acc)
                     for s in ("warm", "joint", "last")}
        sched_cfg = dict(self.train_config.get("lr_schedule",
                                               {"name": "ReduceLROnPlateau"}))
        self.min_abs_lr = float(sched_cfg.pop("min_lr", 0.0))
        self.schedulers = {
            "joint": make_lr_scheduler(sched_cfg, 1.0),
            "last": make_lr_scheduler(sched_cfg, 1.0),
        }
        self._active_stage = "joint"
        self.load_checkpoint_file(self.model_config.get("checkpoint_path"))

    def _steps_for(self, name: str):
        return self._stage_steps[self._STAGE_OF.get(name, "joint")]

    def _state_for(self, name: str) -> TrainState:
        stage = self._STAGE_OF.get(name, "joint")
        return self.state.replace(opt_state=self.opt_states[stage],
                                  acc=self.accs[stage])

    def _set_state_for(self, name: str, state: TrainState) -> None:
        stage = self._STAGE_OF.get(name, "joint")
        self.opt_states[stage] = state.opt_state
        self.accs[stage] = state.acc
        self.state = self.state.replace(
            params=state.params, batch_stats=state.batch_stats, step=state.step
        )

    def _state_primary(self) -> TrainState:
        return self.state

    def _lrs(self):
        stage = self._active_stage
        scale = (self.schedulers["last"].lr if stage == "last"
                 else self.schedulers["joint"].lr)
        return {g: jnp.float32(self._clamp_lr(self.stage_lrs[stage][g], scale))
                for g in GROUPS}

    def _replace_params(self, new_params) -> None:
        self.state = self.state.replace(params=new_params)

    def get_state(self) -> Dict[str, Any]:
        return {
            "epoch": self.current_epoch,
            "iteration": self.current_iteration,
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state_warm": self.opt_states["warm"],
            "opt_state_joint": self.opt_states["joint"],
            "opt_state_last": self.opt_states["last"],
            # in-flight summed micro-grads per stage: without these a resume
            # with accumulation_steps > 1 silently drops partial accumulation
            "acc_warm": self.accs["warm"],
            "acc_joint": self.accs["joint"],
            "acc_last": self.accs["last"],
            "step": self.state.step,
            "best_metric": self.best_metric,
            "lr_scale_joint": self.schedulers["joint"].lr,
            "lr_scale_last": self.schedulers["last"].lr,
        }

    def set_state(self, st: Dict[str, Any]) -> None:
        self.current_epoch = int(st["epoch"])
        self.current_iteration = int(st["iteration"])
        self.best_metric = float(st["best_metric"])
        self.schedulers["joint"].lr = float(st["lr_scale_joint"])
        self.schedulers["last"].lr = float(st["lr_scale_last"])
        for s in ("warm", "joint", "last"):
            self.opt_states[s] = st[f"opt_state_{s}"]
            if f"acc_{s}" in st:
                self.accs[s] = st[f"acc_{s}"]
        self.state = self.state.replace(
            params=st["params"], batch_stats=st["batch_stats"], step=st["step"]
        )

    def train(self) -> None:
        tc = self.train_config
        for epoch in range(self.current_epoch, int(tc["num_train_epochs"])):
            self.current_epoch = epoch
            if epoch < int(tc.get("num_warm_epochs", 0)):
                self._active_stage = "warm"
                logging.info("stage: warm")
                self.run_epoch(epoch, mode="train", optimizer_name="warm")
            else:
                self._active_stage = "joint"
                logging.info("stage: joint")
                self.run_epoch(epoch, mode="train", optimizer_name="joint")

            if epoch == int(tc.get("num_warm_epochs", 0)):
                self.push(replace_prototypes=False)

            _, mean_f1, _ = self.run_epoch(epoch, mode="val")
            self.save_model_w_condition(f"{epoch}nopush", mean_f1, 0.75)

            if epoch > int(tc.get("num_warm_epochs", 0)):
                if tc.get("lr_schedule", {}).get("name") != "StepLR":
                    self.schedulers["joint"].step(mean_f1)

            if (epoch >= int(tc.get("push_start", 1 << 30))
                    and epoch % int(tc.get("push_rate", 5)) == 0):
                self.push(replace_prototypes=True)
                _, mean_f1, _ = self.run_epoch(epoch, mode="val_push")
                self.save_model_w_condition(f"{epoch}push", mean_f1, 0.65)

                self._active_stage = "last"
                logging.info("stage: last-layer only")
                for i in range(5):
                    self.run_epoch(epoch, mode="train", optimizer_name="last")
                    _, mean_f1, _ = self.run_epoch(epoch, mode="val_push")
                    self.save_model_w_condition(f"{epoch}_{i}push", mean_f1, 0.70)
                    self.schedulers["last"].step(mean_f1)
                    is_best = mean_f1 > self.best_metric
                    if is_best:
                        self.best_metric = mean_f1
                        logging.info(f"new best mean_f1 {mean_f1:.4f}")
                    self.save_checkpoint(is_best=is_best)

            self.save_checkpoint(is_best=False)
