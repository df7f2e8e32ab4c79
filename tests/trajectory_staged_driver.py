"""float64 STAGED-schedule trajectory parity vs torch (subprocess).

VERDICT round-2 item 4a: the staged agents' warm -> joint -> push ->
last-only schedule with THREE separate Adam states (reference
XProtoNet_Base.get_optimizer:83-138, train:169-251) is where
optimizer-state/freezing bugs live. This driver runs that full schedule
side by side with a torch twin holding three torch.optim.Adam objects
(warm: add_on+occurrence+prototypes; joint: +backbone; last: fc only)
and compares parameters at every stage boundary at rtol 1e-7.

Reuses the model twin + import + push helpers from trajectory_driver.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from protoasnet_tpu.utils.run import enable_test_compilation_cache

# Same per-uid, per-machine cache dir as conftest (single source of
# truth; x64 programs key separately inside it).
enable_test_compilation_cache()

import jax.numpy as jnp
import numpy as np
import torch

from protoasnet_tpu.losses.bundle import LossBundle
from protoasnet_tpu.models.builder import build_model, init_model
from protoasnet_tpu.models.layers import prototype_class_identity
from protoasnet_tpu.models.torch_import import convert_r2plus1d
from protoasnet_tpu.push.push import push_prototypes
from protoasnet_tpu.train.optim import GROUPS, make_adam
from protoasnet_tpu.train.steps import TrainState, make_xprotonet_steps
from tests.test_grad_parity_torch import (AB_W, D, K, P, TorchProtoASNet,
                                          _import_head, torch_loss)
from tests.trajectory_driver import (B, LR, RTOL, WD, _compare,
                                     _make_batches, _torch_push)


def main():
    assert jnp.zeros(1).dtype == jnp.float64, "x64 mode did not engage"
    tm = TorchProtoASNet().double()
    tm.train()
    # the reference's three optimizers (XProtoNet_Base.get_optimizer)
    warm_params = (list(tm.add_on.parameters())
                   + list(tm.occ.parameters()) + [tm.prototypes])
    joint_params = list(tm.trunk.parameters()) + warm_params
    opts = {
        "warm": torch.optim.Adam(warm_params, lr=LR, weight_decay=WD),
        "joint": torch.optim.Adam(joint_params, lr=LR, weight_decay=WD),
        "last": torch.optim.Adam([tm.fc.weight], lr=LR, weight_decay=WD),
    }

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (P, D, 1, 1, 1),
           "num_classes": K, "img_size": 32}
    model = build_model(cfg, dtype=jnp.float64)
    rng = np.random.default_rng(21)
    batches = _make_batches(rng, 3)

    params, _ = init_model(model, jnp.asarray(batches[0][0][:1]), seed=0)
    bp, bs = convert_r2plus1d(
        {k: v.numpy() for k, v in tm.trunk.state_dict().items()},
        num_stages=3)
    params = _import_head(tm, params)
    params["cnn_backbone"] = bp
    # jnp.array COPIES (jnp.asarray zero-copy-aliases float64 numpy views
    # of torch parameter memory; torch's in-place opt.step() would then
    # corrupt async-deferred jax computations reading them)
    stats = {"cnn_backbone": jax.tree_util.tree_map(jnp.array, bs)}
    params = jax.tree_util.tree_map(jnp.array, params)

    criterion = {
        "CeLossAbstain": {"loss_weight": 1, "ab_weight": AB_W,
                          "ab_logitpath": "joined", "reduction": "mean"},
        "ClusterRoiFeat": {"loss_weight": 0.8, "reduction": "mean"},
        "SeparationRoiFeat": {"loss_weight": 0.08, "reduction": "mean"},
        "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
    }
    bundle = LossBundle(criterion, num_classes=K, abstain_class=True)
    tx = make_adam(weight_decay_by_group={g: WD for g in GROUPS},
                   params=params)
    # one compiled step per stage, as the staged agent builds them
    steps = {}
    for stage in ("warm", "joint", "last"):
        steps[stage] = make_xprotonet_steps(
            model, bundle, tx, accumulation_steps=1, stage=stage,
            donate=False)
    push_step = steps["joint"][2]
    lrs = {g: jnp.asarray(LR, jnp.float64) for g in GROUPS}
    ident = prototype_class_identity(P, K)

    # the staged agent's state layout: shared params/batch_stats, one Adam
    # state per stage (xprotonet.py::XProtoNetStagedAgent.opt_states)
    state = TrainState.create(params, stats, tx)
    opt_states = {s: tx.init(params) for s in ("warm", "joint", "last")}
    accs = {s: state.acc for s in ("warm", "joint", "last")}

    def run_stage(stage, n_steps, key_base):
        nonlocal state
        st = state.replace(opt_state=opt_states[stage], acc=accs[stage])
        step_fn = steps[stage][0]
        for i, (x, y) in enumerate(batches[:n_steps]):
            st, m = step_fn(st, jnp.asarray(x), jnp.asarray(y),
                            jnp.ones(B, bool),
                            jax.random.PRNGKey(key_base + i), lrs)
            opts[stage].zero_grad()
            xt = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
            lt = torch_loss(tm, xt, torch.tensor(y), ident)
            lt.backward()
            opts[stage].step()
            np.testing.assert_allclose(
                float(m["loss_all"]), float(lt.detach()), rtol=1e-6,
                err_msg=f"{stage} step {i} loss")
        opt_states[stage] = st.opt_state
        accs[stage] = st.acc
        state = state.replace(params=st.params, batch_stats=st.batch_stats)

    # ---- WARM (2 steps, warm Adam only) ----
    stem0 = np.asarray(
        state.params["cnn_backbone"]["stem_spatial"]["kernel"]).copy()
    run_stage("warm", 2, 100)
    np.testing.assert_array_equal(
        np.asarray(state.params["cnn_backbone"]["stem_spatial"]["kernel"]),
        stem0, err_msg="warm must not touch backbone")
    _compare(state.params, tm, "after warm stage")

    # ---- JOINT (2 steps, separate joint Adam starting from zero moments,
    # while the warm Adam's moments stay frozen — reference keeps all
    # three optimizers alive across stages) ----
    run_stage("joint", 2, 200)
    _compare(state.params, tm, "after joint stage")

    # ---- PUSH + replacement ----
    loader = [
        {"cine": jnp.asarray(x), "target_AS": y.astype(np.int32),
         "valid": np.ones(B, bool),
         "filename": [f"v{bi}_{a}" for a in range(B)],
         "video_idx": np.arange(B) + 10 * bi,
         "window_start": np.zeros(B, np.int32),
         "window_end": np.full(B, 8, np.int32)}
        for bi, (x, y) in enumerate(batches)
    ]
    new_params, _ = push_prototypes(
        loader, push_step, state.params, state.batch_stats,
        class_identity=ident, abstain_class=True, render=False,
        root_dir_for_saving_prototypes=None, replace_prototypes=True)
    state = state.replace(params=new_params)
    _torch_push(tm, batches, ident)
    _compare(state.params, tm, "after push")

    # ---- LAST-ONLY (5 steps, fc-only Adam; prototypes/backbone frozen;
    # reference XProtoNet_Base.train:229-251 runs last_only iterations
    # right after each push) ----
    proto0 = np.asarray(state.params["prototype_vectors"]).copy()
    for rep in range(5):
        run_stage("last", min(2, len(batches)), 300 + 10 * rep)
    np.testing.assert_array_equal(
        np.asarray(state.params["prototype_vectors"]), proto0,
        err_msg="last-only must not touch prototypes")
    _compare(state.params, tm, "after 5x last-only")

    # ---- one more JOINT step: its Adam moments must have persisted
    # untouched through warm/push/last (the 3-optimizer property) ----
    run_stage("joint", 1, 400)
    _compare(state.params, tm, "after joint resume")

    print("STAGED_TRAJECTORY_OK")


if __name__ == "__main__":
    main()
