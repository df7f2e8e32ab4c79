"""float64 trajectory-parity driver (run in a SUBPROCESS by
tests/test_trajectory_parity.py — x64 mode is process-global in JAX).

Runs the full ProtoASNet training loop — N Adam steps (train-mode BN,
torch-style weight decay), a prototype PUSH over the same mini-dataset,
in-place prototype replacement, and a post-push step — side by side with
a torch twin in float64, comparing parameters at every boundary at
near-machine precision. In float32 this comparison is impossible: Adam's
first-step update is ~lr * sign(grad), so any near-zero gradient whose
fp32 rounding differs between frameworks moves its parameter by a full
±lr. float64 pushes that noise floor below any real gradient.

Reference semantics mirrored: training loop XProtoNet_e2e.py:109-148,
push + replacement push_abs_revision.py:287-346.
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
from tests.test_grad_parity_torch import (
    AB_W,
    D,
    K,
    P,
    TorchProtoASNet,
    _import_head,
    torch_loss,
)

LR = 1e-3
WD = 1e-3
N_STEPS = 3
B = 3
RTOL, ATOL = 1e-7, 1e-10


def _make_batches(rng, n):
    return [
        (rng.normal(size=(B, 8, 32, 32, 3)),
         rng.integers(0, K - 1, size=B).astype(np.int64))
        for _ in range(n)
    ]


def _torch_roi(tm, x):
    f = tm.trunk(x)
    feat = tm.add_on(f).unsqueeze(1)
    occ = torch.abs(tm.occ(f)).unsqueeze(2)
    return (occ * feat).sum(dim=(3, 4, 5))


def _torch_push(tm, batches, ident):
    """Reference push: eval-mode scan, class-masked global argmin of
    dist = 1 - (cos+1)/2, cross-batch <= tie keeps the latest, in-place
    replacement (push_abs_revision.py:287-346)."""
    tm.eval()
    proto_class = ident.argmax(1)
    class_specific = np.ones(P, bool)
    per = P // K
    class_specific[(K - 1) * per:] = False  # abstain protos: class-agnostic

    best = np.full(P, np.inf)
    best_roi = np.zeros((P, D), np.float64)
    best_where = np.full((P, 2), -1, np.int64)
    cos = torch.nn.CosineSimilarity(dim=1)
    with torch.no_grad():
        for bi, (x, y) in enumerate(batches):
            xt = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
            roi = _torch_roi(tm, xt)
            for j in range(P):
                sim01 = (cos(roi[:, j], tm.prototypes[j:j + 1]) + 1) / 2
                dist = (1 - sim01).numpy().astype(np.float64)
                if class_specific[j]:
                    dist = np.where(y == proto_class[j], dist, np.inf)
                a = int(np.argmin(dist))  # within-batch: first wins
                if np.isfinite(dist[a]) and dist[a] <= best[j]:
                    best[j] = dist[a]
                    best_roi[j] = roi[a, j].numpy()
                    best_where[j] = (bi, a)
        for j in range(P):
            if best_where[j, 0] >= 0:
                tm.prototypes.data[j] = torch.tensor(best_roi[j])
    tm.train()
    return best_where


def _compare(params, tm, tag):
    np.testing.assert_allclose(
        np.asarray(params["prototype_vectors"]),
        tm.prototypes.detach().numpy(), rtol=RTOL, atol=ATOL,
        err_msg=f"{tag}: prototype_vectors")
    np.testing.assert_allclose(
        np.asarray(params["last_layer"]["Dense_0"]["kernel"]),
        tm.fc.weight.detach().numpy().T, rtol=RTOL, atol=ATOL,
        err_msg=f"{tag}: fc kernel")
    np.testing.assert_allclose(
        np.asarray(params["occurrence_module"]["Dense_2"]["kernel"]),
        tm.occ[4].weight.detach().numpy().reshape(P, -1).T,
        rtol=RTOL, atol=ATOL, err_msg=f"{tag}: occurrence kernel")
    np.testing.assert_allclose(
        np.asarray(params["cnn_backbone"]["stem_spatial"]["kernel"]),
        np.transpose(tm.trunk.stem[0].weight.detach().numpy(),
                     (2, 3, 4, 1, 0)),
        rtol=RTOL, atol=ATOL, err_msg=f"{tag}: backbone stem kernel")


def main():
    assert jnp.zeros(1).dtype == jnp.float64, "x64 mode did not engage"
    tm = TorchProtoASNet().double()
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=LR, weight_decay=WD)

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (P, D, 1, 1, 1),
           "num_classes": K, "img_size": 32}
    model = build_model(cfg, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    batches = _make_batches(rng, N_STEPS)

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
    leaf_dtypes = {a.dtype for a in jax.tree_util.tree_leaves(params)}
    assert leaf_dtypes == {jnp.dtype(jnp.float64)}, leaf_dtypes

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
    train_step, _, push_step = make_xprotonet_steps(
        model, bundle, tx, accumulation_steps=1, stage="all", donate=False)
    state = TrainState.create(params, stats, tx)
    lrs = {g: jnp.asarray(LR, jnp.float64) for g in GROUPS}
    ident = prototype_class_identity(P, K)

    # ---- N train steps (train-mode BN, Adam + torch-style wd) ----
    losses_j, losses_t = [], []
    for x, y in batches:
        state, m = train_step(state, jnp.asarray(x), jnp.asarray(y),
                              jnp.ones(B, bool), jax.random.PRNGKey(0), lrs)
        losses_j.append(float(m["loss_all"]))
        opt.zero_grad()
        xt = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
        lt = torch_loss(tm, xt, torch.tensor(y), ident)
        lt.backward()
        opt.step()
        losses_t.append(float(lt.detach()))
    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-9,
                               err_msg="per-step losses")
    _compare(state.params, tm, f"after {N_STEPS} steps")
    # BN running stats track torch (biased var normalizes, UNBIASED feeds
    # the running average — models/norm.py)
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["cnn_backbone"]["stem_bn1"]["var"]),
        tm.trunk.stem[1].running_var.detach().numpy(), rtol=1e-9,
        err_msg="stem BN running var")

    # ---- push over the same mini-dataset ----
    loader = [
        {"cine": jnp.asarray(x), "target_AS": y.astype(np.int32),
         "valid": np.ones(B, bool),
         "filename": [f"v{bi}_{a}" for a in range(B)],
         "video_idx": np.arange(B) + 10 * bi,
         "window_start": np.zeros(B, np.int32),
         "window_end": np.full(B, 8, np.int32)}
        for bi, (x, y) in enumerate(batches)
    ]
    new_params, info = push_prototypes(
        loader, push_step, state.params, state.batch_stats,
        class_identity=ident, abstain_class=True, render=False,
        root_dir_for_saving_prototypes=None, replace_prototypes=True)
    state = state.replace(params=new_params)

    t_where = _torch_push(tm, batches, ident)
    assert (t_where[:, 0] >= 0).all(), "torch push found no winner"
    ours_where = np.stack([
        [int(fn.split("_")[0][1:]) if fn else -1
         for fn in info["prototypes_filenames"]],
        [int(fn.split("_")[1]) if fn else -1
         for fn in info["prototypes_filenames"]],
    ], axis=1)
    np.testing.assert_array_equal(ours_where, t_where,
                                  err_msg="push winner identities")
    _compare(state.params, tm, "after push replacement")

    # ---- one more train step post-replacement (Adam moments persist
    # through the replacement on both sides, reference behavior) ----
    x, y = batches[0]
    state, m = train_step(state, jnp.asarray(x), jnp.asarray(y),
                          jnp.ones(B, bool), jax.random.PRNGKey(1), lrs)
    opt.zero_grad()
    xt = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
    lt = torch_loss(tm, xt, torch.tensor(y), ident)
    lt.backward()
    opt.step()
    np.testing.assert_allclose(float(m["loss_all"]), float(lt.detach()),
                               rtol=1e-9, err_msg="post-push loss")
    _compare(state.params, tm, "after post-push step")

    # ---- WARM-stage leg: the staged agents' frozen-group semantics.
    # The reference warm optimizer covers ONLY add_on + occurrence +
    # prototypes (XProtoNet_Base warm_only); backbone and fc are absent
    # from the optimizer entirely, so they must stay BITWISE unchanged
    # while the trained groups track torch exactly.
    warm_params = (list(tm.add_on.parameters())
                   + list(tm.occ.parameters()) + [tm.prototypes])
    opt_w = torch.optim.Adam(warm_params, lr=LR, weight_decay=WD)
    warm_step, _, _ = make_xprotonet_steps(
        model, bundle, tx, accumulation_steps=1, stage="warm", donate=False)
    state = TrainState.create(state.params, state.batch_stats, tx)

    fc_before = tm.fc.weight.detach().numpy().copy()
    stem_before = np.asarray(
        state.params["cnn_backbone"]["stem_spatial"]["kernel"]).copy()
    for x, y in batches[:2]:
        state, m = warm_step(state, jnp.asarray(x), jnp.asarray(y),
                             jnp.ones(B, bool), jax.random.PRNGKey(0), lrs)
        opt_w.zero_grad()
        xt = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
        lt = torch_loss(tm, xt, torch.tensor(y), ident)
        lt.backward()
        opt_w.step()
        # looser than the first leg: both sides carry the (tiny) drift
        # accumulated over the preceding steps+push into this leg
        np.testing.assert_allclose(float(m["loss_all"]), float(lt.detach()),
                                   rtol=1e-6, err_msg="warm-stage loss")
    # frozen groups: bitwise-unchanged on our side, torch-equal overall
    np.testing.assert_array_equal(
        np.asarray(state.params["cnn_backbone"]["stem_spatial"]["kernel"]),
        stem_before, err_msg="warm stage must not touch the backbone")
    np.testing.assert_array_equal(
        tm.fc.weight.detach().numpy(), fc_before,
        err_msg="torch twin fc moved in warm stage?!")
    _compare(state.params, tm, "after 2 warm-stage steps")

    print(f"losses {losses_j} == {losses_t}")
    print("TRAJECTORY_OK")


if __name__ == "__main__":
    main()
