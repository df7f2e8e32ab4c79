"""Optimizers, parameter-group labeling, grad accumulation, LR control.

Replicates the reference's optimizer surface in optax:

* torch-Adam semantics: ``grad + wd * param`` BEFORE the moment update
  (torch.optim.Adam weight_decay, used with wd=1e-3 — XProtoNet_e2e.py:29-35),
  not AdamW.
* grad accumulation SUMS gradients over ``accumulation_steps`` micro-batches
  and steps once, exactly like the reference's repeated loss.backward()
  (Video_XProtoNet_e2e.py:137-142) — NOT optax.MultiSteps' mean.
* learning rate enters the update as a runtime scalar (fed by the host-side
  ReduceLROnPlateau controller), so LR changes never trigger recompiles.
* staged training (warm / joint / last, XProtoNet_Base.py:253-293) is
  expressed as per-group boolean masks that zero gradients of frozen groups
  — frozen params keep zero Adam moments, matching torch requires_grad.

Param groups (labels over the flax param tree):
  backbone | add_on | occurrence | prototypes | last_layer
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "label_params",
    "trainable_mask",
    "STAGE_GROUPS",
    "make_adam",
    "GradAccumulator",
    "ReduceLROnPlateau",
    "make_group_lr_tree",
]

GROUPS = ("backbone", "add_on", "occurrence", "prototypes", "last_layer")

# which groups train in each stage (reference warm_only/joint/last_only)
STAGE_GROUPS = {
    "warm": ("add_on", "occurrence", "prototypes"),
    "joint": ("backbone", "add_on", "occurrence", "prototypes"),
    "last": ("last_layer",),
    "all": GROUPS,
}


def _label_of_path(path: Tuple) -> str:
    top = path[0].key if hasattr(path[0], "key") else str(path[0])
    if top in ("cnn_backbone", "features"):
        return "backbone"
    if top == "add_on_layers":
        return "add_on"
    if top == "occurrence_module":
        return "occurrence"
    if top == "prototype_vectors":
        return "prototypes"
    if top == "last_layer":
        return "last_layer"
    return "backbone"  # any future trunk params default to backbone group


def label_params(params) -> Any:
    """Pytree of group-label strings matching the param tree."""
    return jax.tree_util.tree_map_with_path(lambda p, _: _label_of_path(p), params)


def trainable_mask(params, stage: str) -> Any:
    groups = set(STAGE_GROUPS[stage])
    labels = label_params(params)
    return jax.tree_util.tree_map(lambda lbl: lbl in groups, labels)


def make_group_lr_tree(params, group_lrs: Dict[str, float]) -> Any:
    """Pytree of per-leaf learning rates from a {group: lr} dict."""
    labels = label_params(params)
    return jax.tree_util.tree_map(lambda lbl: float(group_lrs[lbl]), labels)


def make_adam(weight_decay_by_group: Optional[Dict[str, float]] = None,
              params=None, b1=0.9, b2=0.999, eps=1e-8) -> optax.GradientTransformation:
    """Adam core WITHOUT a learning rate (lr applied by the caller as a
    runtime scalar/tree). Weight decay is torch-Adam style and per-group."""
    txs = []
    if weight_decay_by_group:
        labels = label_params(params)
        wd_tree = jax.tree_util.tree_map(
            lambda lbl: float(weight_decay_by_group.get(lbl, 0.0)), labels
        )

        def add_wd(updates, state, params=None):
            del state
            upd = jax.tree_util.tree_map(
                lambda g, p, wd: g + wd * p, updates, params, wd_tree
            )
            return upd, optax.EmptyState()

        txs.append(optax.GradientTransformation(lambda p: optax.EmptyState(), add_wd))
    txs.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    return optax.chain(*txs)


class GradAccumulator(NamedTuple):
    """State for sum-style gradient accumulation."""

    acc: Any  # grad-sum pytree
    count: jnp.ndarray  # () int32 micro-steps since last apply

    @staticmethod
    def init(params) -> "GradAccumulator":
        return GradAccumulator(
            acc=jax.tree_util.tree_map(jnp.zeros_like, params),
            count=jnp.zeros((), jnp.int32),
        )


def accumulate_and_maybe_update(
    tx: optax.GradientTransformation,
    grads,
    acc_state: GradAccumulator,
    opt_state,
    params,
    every: int,
):
    """Returns (updates_or_zero, new_acc_state, new_opt_state, applied_flag).

    Sums grads; on the ``every``-th micro-step runs the real transform on
    the summed grads (reference parity: un-normalized accumulation)."""
    acc = jax.tree_util.tree_map(lambda a, g: a + g, acc_state.acc, grads)
    count = acc_state.count + 1

    def do_update(_):
        upd, new_opt = tx.update(acc, opt_state, params)
        zeroed = jax.tree_util.tree_map(jnp.zeros_like, acc)
        return upd, zeroed, new_opt, jnp.ones((), jnp.bool_)

    def no_update(_):
        zero_upd = jax.tree_util.tree_map(jnp.zeros_like, acc)
        return zero_upd, acc, opt_state, jnp.zeros((), jnp.bool_)

    if every <= 1:
        upd, new_opt = tx.update(grads, opt_state, params)
        return upd, GradAccumulator.init(params), new_opt, jnp.ones((), jnp.bool_)

    upd, new_acc, new_opt, applied = jax.lax.cond(
        count % every == 0, do_update, no_update, operand=None
    )
    new_count = jnp.where(count % every == 0, 0, count)
    return upd, GradAccumulator(new_acc, new_count), new_opt, applied


class ReduceLROnPlateau:
    """Host-side controller with torch.optim.lr_scheduler semantics
    (mode max on mean-F1, factor/patience/threshold/cooldown/min_lr —
    Ours_ProtoASNet_Video.yml:65-73)."""

    def __init__(self, initial_lr: float, mode: str = "max", factor: float = 0.5,
                 patience: int = 5, threshold: float = 1e-4, cooldown: int = 0,
                 min_lr: float = 0.0, **_ignored):
        self.lr = float(initial_lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.best: Optional[float] = None
        self.num_bad = 0
        self.cooldown_counter = 0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold) if self.best >= 0 \
                else metric > self.best * (1.0 - self.threshold)
        return metric < self.best * (1.0 - self.threshold) if self.best >= 0 \
            else metric < self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad = 0
        return self.lr


class StepLR:
    """torch StepLR: lr decays by gamma every step_size epochs."""

    def __init__(self, initial_lr: float, step_size: int = 10, gamma: float = 0.1,
                 **_ignored):
        self.base = float(initial_lr)
        self.lr = float(initial_lr)
        self.step_size = step_size
        self.gamma = gamma
        self._epochs = 0

    def step(self, metric: float = 0.0) -> float:
        self._epochs += 1
        self.lr = self.base * (self.gamma ** (self._epochs // self.step_size))
        return self.lr


def make_lr_scheduler(schedule_cfg: Dict[str, Any], initial_lr: float):
    name = schedule_cfg.get("name", "ReduceLROnPlateau")
    cfg = {k: v for k, v in schedule_cfg.items() if k != "name"}
    if name == "ReduceLROnPlateau":
        return ReduceLROnPlateau(initial_lr, **cfg)
    if name == "StepLR":
        return StepLR(initial_lr, **cfg)
    raise ValueError(f"Unknown lr schedule {name!r}")
