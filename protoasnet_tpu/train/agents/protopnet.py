"""ProtoPNet baseline agents: staged (3-optimizer) and end-to-end.

Parity: ProtoPNet_Base (src/agents/ProtoPNet_Base.py:36-515, staged
warm -> joint(StepLR) -> push -> 2x last-layer iterations) and
ProtoPNet_e2e (src/agents/ProtoPNet_e2e.py:18-140, one Adam).
Loss set: CE + ClusterPatch + SeparationPatch + L1(FC).
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
from protoasnet_tpu.push.push_protopnet import push_prototypes_patch
from protoasnet_tpu.train.agents.base import BaseAgent
from protoasnet_tpu.train.optim import GROUPS, make_adam, make_lr_scheduler
from protoasnet_tpu.train.steps import TrainState, make_protopnet_steps
from protoasnet_tpu.utils.run import makedir

__all__ = ["ProtoPNetStagedAgent", "ProtoPNetE2EAgent"]

_CFG_GROUP = {
    "features": "backbone",
    "cnn_backbone": "backbone",
    "add_on_layers": "add_on",
    "prototype_vectors": "prototypes",
    "last_layer": "last_layer",
}


class _ProtoPNetCommon(BaseAgent):
    def _make_bundle(self) -> LossBundle:
        return LossBundle(
            self.train_config["criterion"],
            num_classes=int(self.model_config["num_classes"]),
            abstain_class=False,
            variant="protopnet",
        )

    def run_epoch(self, epoch: int, mode: str = "train",
                  optimizer_name: str = "default") -> Tuple[float, float, float]:
        dataloader_mode = mode.split("_")[0] if "_push" in mode else mode
        loader = self.data_loaders[dataloader_mode]
        loader.set_epoch(epoch)
        metrics = self.make_metrics()
        is_train = mode == "train"
        t0 = time.time()
        epoch_pred_log = []
        train_step, eval_step = self._steps_for(optimizer_name)

        for batch in loader:
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
            m = jax.device_get(m)  # one host sync per step
            loss_terms = {k: float(v) for k, v in m.items() if k.startswith("loss")}
            metrics.update(m["logits"], batch["target_AS"], batch["valid"],
                           similarities=None, loss_terms=loss_terms)
            if mode in ("val_push", "test"):
                epoch_pred_log.append(
                    self.create_pred_log_df(batch, np.asarray(m["logits"])))

        summary = metrics.compute()
        logging.info(
            f"Epoch:{epoch}_{mode} | Time:{time.time() - t0:.0f}s | "
            f"Loss:{summary['losses'].get('loss_all', 0):.3f} | "
            f"Acc: {summary['accuracy']:.2%} | f1_avg: {summary['f1_mean']:.4f} | "
            f"AUC: {summary['AUC']:.4f}"
        )
        self.tracker.log({
            "epoch": epoch,
            f"epoch/{mode}/loss_all": summary["losses"].get("loss_all", 0.0),
            f"epoch/{mode}/f1_mean": summary["f1_mean"],
            f"epoch/{mode}/accuracy": summary["accuracy"],
            f"epoch/{mode}/AUC_mean": summary["AUC"],
        })
        if mode in ("val_push", "test") and epoch_pred_log:
            path_to_csv = os.path.join(self.save_dir, f"csv_{mode}")
            makedir(path_to_csv)
            pd.concat(epoch_pred_log).reset_index(drop=True).to_csv(os.path.join(
                path_to_csv, f"e{epoch:02d}_f1_{summary['f1_mean']:.0%}.csv"))
        return summary["accuracy"], summary["f1_mean"], summary["AUC"]

    def push(self, replace_prototypes: bool = True) -> None:
        epoch = f"{self.current_epoch}_pushed"
        new_params, _ = push_prototypes_patch(
            self.data_loaders["train_push"],
            self.push_step,
            self.params,
            self.batch_stats,
            model=self.model,
            class_identity=self.model.class_identity(),
            root_dir_for_saving_prototypes=os.path.join(self.save_dir, "img"),
            epoch_number=epoch,
            replace_prototypes=replace_prototypes,
            img_size=int(self.data_config.get("img_size", 224)),
        )
        if replace_prototypes:
            self._replace_params(new_params)

    def _steps_for(self, name: str):
        raise NotImplementedError

    def _state_for(self, name: str) -> TrainState:
        raise NotImplementedError

    def _set_state_for(self, name: str, state: TrainState) -> None:
        raise NotImplementedError

    def _lrs(self):
        raise NotImplementedError

    def _replace_params(self, new_params) -> None:
        raise NotImplementedError


class ProtoPNetE2EAgent(_ProtoPNetCommon):
    def __init__(self, config: Dict[str, Any]):
        super().__init__(config)
        opt_cfg = self.train_config["optimizer"]
        mode = opt_cfg.get("mode", "lr_same")
        if mode == "lr_same":
            lr = float(opt_cfg["lr_same"])
            self.base_lrs = {g: lr for g in GROUPS}
            wd = {g: 1e-3 for g in GROUPS}
        elif mode == "lr_disjoint":
            spec = opt_cfg["lr_disjoint"]
            self.base_lrs = {_CFG_GROUP[k]: float(v) for k, v in spec.items()}
            self.base_lrs.setdefault("occurrence", 0.0)
            wd = {"backbone": 1e-3, "add_on": 1e-3}
        else:
            raise ValueError(f"optimizer mode {mode!r} not valid")
        self.lr = self.base_lrs["prototypes"]
        self.bundle = self._make_bundle()
        self.tx = make_adam(weight_decay_by_group=wd, params=self._params0)
        self.state = TrainState.create(self._params0, self._bstats0, self.tx)
        self._train_step, self._eval_step, self.push_step = make_protopnet_steps(
            self.model, self.bundle, self.tx,
            accumulation_steps=int(self.train_config.get("accumulation_steps", 1)),
            stage="all",
        )
        self.scheduler = make_lr_scheduler(
            self.train_config.get("lr_schedule", {"name": "StepLR"}), 1.0)
        self.load_checkpoint_file(self.model_config.get("checkpoint_path"))

    def _steps_for(self, name):
        return self._train_step, self._eval_step

    def _state_for(self, name):
        return self.state

    def _set_state_for(self, name, state):
        self.state = state

    @property
    def params(self):
        return self.state.params

    @property
    def batch_stats(self):
        return self.state.batch_stats

    def _lrs(self):
        scale = self.scheduler.lr
        return {g: jnp.float32(self.base_lrs.get(g, 0.0) * scale) for g in GROUPS}

    def _replace_params(self, new_params):
        self.state = self.state.replace(params=new_params)

    def get_state(self):
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

    def set_state(self, st):
        self.current_epoch = int(st["epoch"])
        self.current_iteration = int(st["iteration"])
        self.best_metric = float(st["best_metric"])
        self.scheduler.lr = float(st["lr_scale"])
        self.state = self.state.replace(
            params=st["params"], batch_stats=st["batch_stats"],
            opt_state=st["opt_state"], acc=st["acc"], step=st["step"])

    def train(self):
        tc = self.train_config
        for epoch in range(self.current_epoch, int(tc["num_train_epochs"])):
            self.current_epoch = epoch
            self.run_epoch(epoch, mode="train")
            _, mean_f1, _ = self.run_epoch(epoch, mode="val")
            self.scheduler.step(mean_f1)
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
                self.save_checkpoint(is_best=is_best)
            self.save_checkpoint(is_best=False)


class ProtoPNetStagedAgent(_ProtoPNetCommon):
    """Staged agent with per-stage optimizer states (warm/joint/last)."""

    _STAGE_OF = {"warm": "warm", "joint": "joint", "last": "last"}

    def __init__(self, config: Dict[str, Any]):
        super().__init__(config)
        opt_cfg = self.train_config["optimizer"]
        joint = {_CFG_GROUP[k]: float(v)
                 for k, v in opt_cfg.get("joint_lrs", {}).items()}
        warm = {_CFG_GROUP[k]: float(v)
                for k, v in opt_cfg.get("warm_lrs", {}).items()}
        last_lr = float(opt_cfg.get("last_layer_lr", 1e-4))
        base = {g: joint.get(g, 1e-4) for g in GROUPS}
        self.stage_lrs = {
            "warm": {**base, **warm},
            "joint": {**base, **joint},
            "last": {**base, "last_layer": last_lr},
        }
        self.lr = self.stage_lrs["joint"]["prototypes"]
        wd = {"backbone": 1e-3, "add_on": 1e-3}
        self.bundle = self._make_bundle()
        self.tx = make_adam(weight_decay_by_group=wd, params=self._params0)
        accum = int(self.train_config.get("accumulation_steps", 1))
        self._stage_steps = {}
        for stage in ("warm", "joint", "last"):
            steps = make_protopnet_steps(self.model, self.bundle, self.tx,
                                         accumulation_steps=accum, stage=stage)
            self._stage_steps[stage] = steps[:2]
            if stage == "joint":
                self.push_step = steps[2]
        self.state = TrainState.create(self._params0, self._bstats0, self.tx)
        self.opt_states = {s: self.tx.init(self._params0)
                           for s in ("warm", "joint", "last")}
        # each stage gets its OWN accumulator buffers: the train step
        # donates its input state (steps.py donate=True), so sharing one
        # GradAccumulator across stages would let the first stage's step
        # delete the arrays the other stages' entries still reference —
        # the next save_checkpoint (get_state serializes all three accs)
        # then dies with "Array has been deleted"
        self.accs = {s: jax.tree_util.tree_map(jnp.array, self.state.acc)
                     for s in ("warm", "joint", "last")}
        self.scheduler = make_lr_scheduler(
            self.train_config.get("lr_schedule", {"name": "StepLR"}), 1.0)
        self._active_stage = "joint"
        self.load_checkpoint_file(self.model_config.get("checkpoint_path"))

    def _steps_for(self, name):
        return self._stage_steps[self._STAGE_OF.get(name, "joint")]

    def _state_for(self, name):
        stage = self._STAGE_OF.get(name, "joint")
        return self.state.replace(opt_state=self.opt_states[stage],
                                  acc=self.accs[stage])

    def _set_state_for(self, name, state):
        stage = self._STAGE_OF.get(name, "joint")
        self.opt_states[stage] = state.opt_state
        self.accs[stage] = state.acc
        self.state = self.state.replace(
            params=state.params, batch_stats=state.batch_stats, step=state.step)

    @property
    def params(self):
        return self.state.params

    @property
    def batch_stats(self):
        return self.state.batch_stats

    def _lrs(self):
        stage = self._active_stage
        scale = self.scheduler.lr if stage == "joint" else 1.0
        return {g: jnp.float32(self.stage_lrs[stage][g] * scale) for g in GROUPS}

    def _replace_params(self, new_params):
        self.state = self.state.replace(params=new_params)

    def get_state(self):
        return {
            "epoch": self.current_epoch,
            "iteration": self.current_iteration,
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state_warm": self.opt_states["warm"],
            "opt_state_joint": self.opt_states["joint"],
            "opt_state_last": self.opt_states["last"],
            "acc_warm": self.accs["warm"],
            "acc_joint": self.accs["joint"],
            "acc_last": self.accs["last"],
            "step": self.state.step,
            "best_metric": self.best_metric,
            "lr_scale": self.scheduler.lr,
        }

    def set_state(self, st):
        self.current_epoch = int(st["epoch"])
        self.current_iteration = int(st["iteration"])
        self.best_metric = float(st["best_metric"])
        self.scheduler.lr = float(st["lr_scale"])
        for s in ("warm", "joint", "last"):
            self.opt_states[s] = st[f"opt_state_{s}"]
            if f"acc_{s}" in st:
                self.accs[s] = st[f"acc_{s}"]
        self.state = self.state.replace(
            params=st["params"], batch_stats=st["batch_stats"], step=st["step"])

    def train(self):
        tc = self.train_config
        for epoch in range(self.current_epoch, int(tc["num_train_epochs"])):
            self.current_epoch = epoch
            if epoch < int(tc.get("num_warm_epochs", 0)):
                self._active_stage = "warm"
                self.run_epoch(epoch, mode="train", optimizer_name="warm")
            else:
                self._active_stage = "joint"
                self.run_epoch(epoch, mode="train", optimizer_name="joint")
                self.scheduler.step()
            _, mean_f1, _ = self.run_epoch(epoch, mode="val")
            self.save_model_w_condition(f"{epoch}nopush", mean_f1, 0.65)
            if (epoch >= int(tc.get("push_start", 1 << 30))
                    and epoch % int(tc.get("push_rate", 5)) == 0):
                self.push(replace_prototypes=True)
                _, mean_f1, _ = self.run_epoch(epoch, mode="val_push")
                self.save_model_w_condition(f"{epoch}push", mean_f1, 0.65)
                if self.model_config.get("prototype_activation_function",
                                         "log") != "linear":
                    self._active_stage = "last"
                    for i in range(2):
                        self.run_epoch(epoch, mode="train", optimizer_name="last")
                        _, mean_f1, _ = self.run_epoch(epoch, mode="val")
                        self.save_model_w_condition(f"{epoch}_{i}push", mean_f1, 0.65)
                is_best = mean_f1 > self.best_metric
                if is_best:
                    self.best_metric = mean_f1
                self.save_checkpoint(is_best=is_best)
            self.save_checkpoint(is_best=False)
