"""Jitted train / eval step factories.

One compiled XLA program per (stage, mode): forward (+ the TransformLoss
second forward), all loss terms, backward, grad accumulation, masked Adam
update, BN running-stat update. Learning rates enter as runtime scalars so
the host LR controller never causes recompiles. Batches arrive sharded on
the ``data`` mesh axis; XLA inserts the gradient all-reduce.

The hot loop this replaces: Video_XProtoNet_e2e.run_epoch:77-155 (per-batch
forward, 7 losses, backward, accumulation-gated step).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from protoasnet_tpu.losses.bundle import LossBundle
from protoasnet_tpu.train.optim import (
    GradAccumulator,
    accumulate_and_maybe_update,
    label_params,
    trainable_mask,
)

__all__ = ["TrainState", "make_xprotonet_steps", "make_xprotonet_loss_fn",
           "make_protopnet_steps"]


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    acc: GradAccumulator
    step: jnp.ndarray  # () int32 — micro-steps taken

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            acc=GradAccumulator.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def _apply_updates_with_lr(params, updates, labels, lrs: Dict[str, jnp.ndarray]):
    """params - lr[group] * update, per leaf."""
    return jax.tree_util.tree_map(
        lambda p, u, lbl: p - lrs[lbl] * u, params, updates, labels
    )


def _pair_forward(model, params, batch_stats, cine, rng, train: bool):
    """One 2N-batch dispatch for x + affine(x): stacks the pair and vmaps
    the model over the pair axis — XLA folds the vmapped convs into
    single 2N-batch convolutions while BN statistics still reduce PER
    HALF inside the vmap (the reference's TransformLoss second forward
    computes its own batch stats, loss.py:272-320). Returns the main
    half's outputs, the transformed half's occurrence map, the affine
    draw, and (train only) the main half's new BN stats — the
    transformed half's mutated running stats are discarded exactly like
    the two-pass path."""
    from protoasnet_tpu.losses.losses import (affine_batch,
                                              sample_affine_params)

    angle, scale = sample_affine_params(rng)
    xx = jnp.stack([cine, affine_batch(cine, angle, scale)])
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        (logits2, sim2, occ2), mut = jax.vmap(
            lambda x: model.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
        )(xx)
        new_stats = jax.tree_util.tree_map(lambda s: s[0],
                                           mut["batch_stats"])
    else:
        logits2, sim2, occ2 = jax.vmap(
            lambda x: model.apply(variables, x, train=False)
        )(xx)
        new_stats = batch_stats
    return logits2[0], sim2[0], occ2[0], occ2[1], (angle, scale), new_stats


def make_xprotonet_loss_fn(model, bundle: LossBundle, class_identity,
                           combined: bool):
    """Train-mode loss closure shared by the step factory and the
    combined-vs-two-pass parity test (tests/test_train_step.py)."""

    def loss_fn(params, batch_stats, cine, target, valid, rng):
        proto_kwargs = dict(
            prototype_vectors=params["prototype_vectors"],
            fc_kernel=params["last_layer"]["Dense_0"]["kernel"],
            class_identity=class_identity,
        )
        if combined:
            logits, sim, occ, occ_t, aff, new_stats = _pair_forward(
                model, params, batch_stats, cine, rng, train=True
            )
            total, terms = bundle.xprotonet_terms(
                logits, sim, occ, target, **proto_kwargs,
                occ_transformed=occ_t, affine_params=aff, valid=valid,
            )
        else:
            (logits, sim, occ), mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                cine, train=True, mutable=["batch_stats"],
            )
            new_stats = mut["batch_stats"]

            def occ_fn(x_t):
                occ_t, _ = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x_t, train=True, mutable=["batch_stats"],
                    method=model.compute_occurrence_map,
                )
                return occ_t

            total, terms = bundle.xprotonet_terms(
                logits, sim, occ, target, **proto_kwargs,
                x=cine, occ_fn=occ_fn, rng=rng, valid=valid,
            )
        aux = {"terms": terms, "logits": logits, "similarities": sim,
               "batch_stats": new_stats}
        return total, aux

    return loss_fn


def make_xprotonet_steps(
    model,
    bundle: LossBundle,
    tx,
    accumulation_steps: int = 1,
    stage: str = "all",
    donate: bool = True,
    combine_transform: bool = True,
):
    """Returns (train_step, eval_step) for XProtoNet/Video_XProtoNet.

    train_step(state, cine, target, valid, rng, lrs) ->
        (new_state, metrics dict with loss terms + logits + similarities)
    eval_step(variables..., cine, target, valid, rng) -> metrics dict
    ``lrs`` is a {group_name: scalar} dict of runtime learning rates.

    ``combine_transform`` (default on): when the TransformLoss is active,
    its second forward (occ(affine(x)), reference loss.py:272-320) runs in
    the SAME backbone dispatch as the main forward — x and affine(x) stack
    to (2, N, ...) and the model vmaps over the pair axis. XLA folds the
    vmapped convs into single 2N-batch convolutions (better MXU tiling at
    small train batches) while BN statistics still reduce per half inside
    the vmap, preserving the reference's separate-pass BN semantics; the
    transformed half's mutated running stats are discarded exactly like
    the two-pass path.
    """
    class_identity = jnp.asarray(model.class_identity())
    combined = bool(combine_transform) and bundle.transform_enabled
    loss_fn = make_xprotonet_loss_fn(model, bundle, class_identity,
                                     combined=combined)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _train_step(state: TrainState, cine, target, valid, rng, lrs):
        (total, aux), grads = grad_fn(
            state.params, state.batch_stats, cine, target, valid, rng
        )
        # stage freezing: frozen groups must see NO update at all (reference
        # warm/last optimizers exclude frozen modules entirely). Zero their
        # grads, zero the params fed to the torch-style wd hook (so Adam
        # moments stay 0), and zero the final updates — otherwise wd*p alone
        # drives a ~sign(p)*lr drift on frozen pretrained backbones.
        mask = trainable_mask(state.params, stage)
        grads = jax.tree_util.tree_map(
            lambda g, m: g if m else jnp.zeros_like(g), grads, mask
        )
        wd_params = jax.tree_util.tree_map(
            lambda p, m: p if m else jnp.zeros_like(p), state.params, mask
        )
        updates, new_acc, new_opt, applied = accumulate_and_maybe_update(
            tx, grads, state.acc, state.opt_state, wd_params,
            accumulation_steps,
        )
        updates = jax.tree_util.tree_map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, mask
        )
        labels = label_params(state.params)
        new_params = _apply_updates_with_lr(state.params, updates, labels, lrs)
        new_state = state.replace(
            params=new_params,
            batch_stats=aux["batch_stats"],
            opt_state=new_opt,
            acc=new_acc,
            step=state.step + 1,
        )
        metrics = {"loss_all": total, **aux["terms"],
                   "logits": aux["logits"], "similarities": aux["similarities"],
                   "applied": applied}
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    train_step = jax.jit(_train_step, donate_argnums=donate_argnums)

    def _eval_step(params, batch_stats, cine, target, valid, rng):
        proto_kwargs = dict(
            prototype_vectors=params["prototype_vectors"],
            fc_kernel=params["last_layer"]["Dense_0"]["kernel"],
            class_identity=class_identity,
        )
        if combined:
            logits, sim, occ, occ_t, aff, _ = _pair_forward(
                model, params, batch_stats, cine, rng, train=False
            )
            total, terms = bundle.xprotonet_terms(
                logits, sim, occ, target, **proto_kwargs,
                occ_transformed=occ_t, affine_params=aff, valid=valid,
            )
        else:
            logits, sim, occ = model.apply(
                {"params": params, "batch_stats": batch_stats}, cine,
                train=False
            )

            def occ_fn(x_t):
                return model.apply(
                    {"params": params, "batch_stats": batch_stats}, x_t,
                    train=False, method=model.compute_occurrence_map,
                )

            total, terms = bundle.xprotonet_terms(
                logits, sim, occ, target, **proto_kwargs,
                x=cine, occ_fn=occ_fn, rng=rng, valid=valid,
            )
        return {"loss_all": total, **terms, "logits": logits,
                "similarities": sim}

    eval_step = jax.jit(_eval_step)

    def _push_step(params, batch_stats, cine):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, cine, train=False,
            method=model.push_forward,
        )

    push_step = jax.jit(_push_step)
    return train_step, eval_step, push_step


def make_protopnet_steps(
    model,
    bundle: LossBundle,
    tx,
    accumulation_steps: int = 1,
    stage: str = "all",
    donate: bool = True,
):
    """(train_step, eval_step, push_step) for the PPNet baseline."""
    class_identity = jnp.asarray(model.class_identity())

    def loss_fn(params, batch_stats, cine, target, valid):
        (logits, min_d), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            cine, train=True, mutable=["batch_stats"],
        )
        total, terms = bundle.protopnet_terms(
            logits, min_d, target,
            fc_kernel=params["last_layer"]["Dense_0"]["kernel"],
            class_identity=class_identity, valid=valid,
        )
        return total, {"terms": terms, "logits": logits, "min_distances": min_d,
                       "batch_stats": mut["batch_stats"]}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _train_step(state: TrainState, cine, target, valid, rng, lrs):
        del rng
        (total, aux), grads = grad_fn(
            state.params, state.batch_stats, cine, target, valid
        )
        # same frozen-group masking as the xprotonet step (see comment there)
        mask = trainable_mask(state.params, stage)
        grads = jax.tree_util.tree_map(
            lambda g, m: g if m else jnp.zeros_like(g), grads, mask
        )
        wd_params = jax.tree_util.tree_map(
            lambda p, m: p if m else jnp.zeros_like(p), state.params, mask
        )
        updates, new_acc, new_opt, applied = accumulate_and_maybe_update(
            tx, grads, state.acc, state.opt_state, wd_params,
            accumulation_steps,
        )
        updates = jax.tree_util.tree_map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, mask
        )
        labels = label_params(state.params)
        new_params = _apply_updates_with_lr(state.params, updates, labels, lrs)
        new_state = state.replace(
            params=new_params, batch_stats=aux["batch_stats"],
            opt_state=new_opt, acc=new_acc, step=state.step + 1,
        )
        metrics = {"loss_all": total, **aux["terms"], "logits": aux["logits"],
                   "min_distances": aux["min_distances"], "applied": applied}
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    train_step = jax.jit(_train_step, donate_argnums=donate_argnums)

    def _eval_step(params, batch_stats, cine, target, valid, rng):
        del rng
        logits, min_d = model.apply(
            {"params": params, "batch_stats": batch_stats}, cine, train=False
        )
        total, terms = bundle.protopnet_terms(
            logits, min_d, target,
            fc_kernel=params["last_layer"]["Dense_0"]["kernel"],
            class_identity=class_identity, valid=valid,
        )
        return {"loss_all": total, **terms, "logits": logits,
                "min_distances": min_d}

    eval_step = jax.jit(_eval_step)

    def _push_step(params, batch_stats, cine):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, cine, train=False,
            method=model.push_forward,
        )

    push_step = jax.jit(_push_step)
    return train_step, eval_step, push_step
