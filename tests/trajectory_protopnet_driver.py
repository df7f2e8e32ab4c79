"""float64 ProtoPNet trajectory parity vs torch (subprocess).

VERDICT round-2 item 4b: the ProtoPNet baseline path — L2-patch head,
3-optimizer staged schedule (reference ProtoPNet_Base), PATCH push with
in-place prototype replacement (push_ProtoPNet.py:146-325) — previously
had only single-step grad parity. This driver runs warm -> joint ->
patch-push -> last-only against a torch twin at float64 rtol 1e-7.

Twin: resnet18 feature trunk (tests/test_torch_import.TVResNet18Features)
+ regular add-on (conv1x1, ReLU, conv1x1, Sigmoid) + (P, D, 1, 1)
prototypes + bias-free fc. Losses: CE + ClusterPatch + SeparationPatch +
L1 on the fc's incorrect connections, reference reductions.
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
import torch.nn as nn
import torch.nn.functional as F

from protoasnet_tpu.losses.bundle import LossBundle
from protoasnet_tpu.models.builder import build_model, init_model
from protoasnet_tpu.models.layers import prototype_class_identity
from protoasnet_tpu.models.torch_import import convert_resnet2d
from protoasnet_tpu.push.push_protopnet import push_prototypes_patch
from protoasnet_tpu.train.optim import GROUPS, make_adam
from protoasnet_tpu.train.steps import TrainState, make_protopnet_steps
from tests.test_torch_import import TVResNet18Features

P, D, K = 6, 32, 3
B, IMG = 3, 64  # 64px -> 2x2 feature map: the patch argmin has choices
LR, WD = 1e-3, 1e-3
RTOL, ATOL = 1e-7, 1e-9
EPS = 1e-4
ADAM_EPS = 1e-8  # torch default


class TorchPPNet(nn.Module):
    """Reference PPNet semantics (ProtoPNet.py:57-340): L2-conv patch
    distances, global min pool, log activation, bias-free head."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(3)
        self.features = TVResNet18Features()
        self.add_on_layers = nn.Sequential(
            nn.Conv2d(512, D, 1), nn.ReLU(), nn.Conv2d(D, D, 1),
            nn.Sigmoid())
        # keep the pre-Sigmoid activations in the linear region: default
        # kaiming init saturates the Sigmoid, leaving many add_on grads
        # at the float64 noise floor where Adam's first step (~lr*sign(g))
        # amplifies cross-framework reduction noise into real param
        # divergence. Scaled init keeps every grad well above noise so the
        # trajectory comparison stays at rtol 1e-7.
        with torch.no_grad():
            self.add_on_layers[0].weight.mul_(0.05)
            self.add_on_layers[2].weight.mul_(0.2)
        self.prototype_vectors = nn.Parameter(torch.rand(P, D, 1, 1))
        self.last_layer = nn.Linear(P, K, bias=False)

    def conv_features(self, x):
        return self.add_on_layers(self.features(x))

    def distances_from_conv(self, f):
        x2 = (f ** 2).sum(dim=1, keepdim=True)
        w = self.prototype_vectors
        xw = F.conv2d(f, w)
        p2 = (w ** 2).sum(dim=(1, 2, 3)).view(-1, 1, 1)
        return torch.relu(x2 - 2 * xw + p2)  # (N, P, H', W')

    def forward(self, x):
        dist = self.distances_from_conv(self.conv_features(x))
        min_d = -F.max_pool2d(-dist, dist.shape[2:]).flatten(1)  # (N, P)
        act = torch.log((min_d + 1) / (min_d + EPS))
        return self.last_layer(act), min_d


def torch_ppnet_loss(tm, x, y, ident):
    logits, min_d = tm(x)
    ce = F.cross_entropy(logits, y)
    grouped = min_d.reshape(len(y), K, P // K)
    class_min = grouped.min(dim=2).values  # (N, K)
    oh = F.one_hot(y, num_classes=K).double()
    cluster = (class_min * oh).mean(dim=0).sum()
    sep = -((class_min * (1 - oh)).mean(dim=0).sum())
    mask = 1 - torch.tensor(ident.T)
    l1 = (mask * tm.last_layer.weight).norm(p=1)
    return ce + 0.8 * cluster + 0.08 * sep + 1e-4 * l1


def _import_head(tm, params):
    def w(conv):
        return np.asarray(conv.weight.detach()).reshape(
            conv.out_channels, -1).T

    p = dict(params)
    p["add_on_layers"] = {
        "Dense_0": {"kernel": w(tm.add_on_layers[0]),
                    "bias": np.asarray(tm.add_on_layers[0].bias.detach())},
        "Dense_1": {"kernel": w(tm.add_on_layers[2]),
                    "bias": np.asarray(tm.add_on_layers[2].bias.detach())},
    }
    # torch (P, D, 1, 1) -> ours (P, kh, kw, D)
    p["prototype_vectors"] = np.transpose(
        np.asarray(tm.prototype_vectors.detach()), (0, 2, 3, 1))
    p["last_layer"] = {"Dense_0": {
        "kernel": np.asarray(tm.last_layer.weight.detach()).T}}
    return p


def _compare(params, tm, tag, atol=None):
    atol = ATOL if atol is None else atol
    np.testing.assert_allclose(
        np.asarray(params["prototype_vectors"]),
        np.transpose(tm.prototype_vectors.detach().numpy(), (0, 2, 3, 1)),
        rtol=RTOL, atol=atol, err_msg=f"{tag}: prototype_vectors")
    np.testing.assert_allclose(
        np.asarray(params["last_layer"]["Dense_0"]["kernel"]),
        tm.last_layer.weight.detach().numpy().T, rtol=RTOL, atol=ATOL,
        err_msg=f"{tag}: fc kernel")
    np.testing.assert_allclose(
        np.asarray(params["add_on_layers"]["Dense_0"]["kernel"]),
        tm.add_on_layers[0].weight.detach().numpy().reshape(D, -1).T,
        rtol=RTOL, atol=atol, err_msg=f"{tag}: add_on kernel")
    np.testing.assert_allclose(
        np.asarray(params["features"]["conv1"]["kernel"]),
        np.transpose(tm.features.conv1.weight.detach().numpy(),
                     (2, 3, 1, 0)),
        rtol=RTOL, atol=atol, err_msg=f"{tag}: backbone conv1 kernel")


def _torch_patch_push(tm, batches, ident):
    """Reference push_ProtoPNet: eval-mode scan, own-class-masked global
    argmin over (sample, h, w), cross-batch strict < keeps the EARLIEST
    batch (push_ProtoPNet.py:210), within-batch argmin keeps the first;
    prototype <- conv patch."""
    tm.eval()
    proto_class = ident.argmax(1)
    best = np.full(P, np.inf)
    best_patch = np.zeros((P, D))
    with torch.no_grad():
        for x, y in batches:
            xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
            f = tm.conv_features(xt)  # (B, D, H', W')
            dist = tm.distances_from_conv(f).numpy()  # (B, P, H', W')
            for j in range(P):
                dj = dist[:, j].copy()
                dj[np.asarray(y) != proto_class[j]] = np.inf
                a = int(np.argmin(dj))
                bi, hi, wi = np.unravel_index(a, dj.shape)
                if np.isfinite(dj[bi, hi, wi]) and dj[bi, hi, wi] < best[j]:
                    best[j] = dj[bi, hi, wi]
                    best_patch[j] = f[bi, :, hi, wi].numpy()
        for j in range(P):
            if np.isfinite(best[j]):
                tm.prototype_vectors.data[j, :, 0, 0] = torch.tensor(
                    best_patch[j])
    tm.train()


def main():
    assert jnp.zeros(1).dtype == jnp.float64, "x64 mode did not engage"
    tm = TorchPPNet().double()
    tm.train()
    warm_params = (list(tm.add_on_layers.parameters())
                   + [tm.prototype_vectors])
    joint_params = list(tm.features.parameters()) + warm_params
    opts = {
        "warm": torch.optim.Adam(warm_params, lr=LR, weight_decay=WD,
                                 eps=ADAM_EPS),
        "joint": torch.optim.Adam(joint_params, lr=LR, weight_decay=WD,
                                  eps=ADAM_EPS),
        "last": torch.optim.Adam([tm.last_layer.weight], lr=LR,
                                 weight_decay=WD, eps=ADAM_EPS),
    }

    cfg = {"name": "ProtoPNet", "base_architecture": "resnet18",
           "prototype_shape": (P, D, 1, 1), "num_classes": K,
           "img_size": IMG, "add_on_layers_type": "regular"}
    model = build_model(cfg, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    batches = [
        (rng.normal(size=(B, IMG, IMG, 3)),
         rng.integers(0, K, size=B).astype(np.int64))
        for _ in range(3)
    ]
    params, _ = init_model(model, jnp.asarray(batches[0][0][:1]), seed=0)
    bp, bs = convert_resnet2d(
        {k: v.numpy() for k, v in tm.features.state_dict().items()},
        "resnet18")
    params = _import_head(tm, params)
    params["features"] = bp
    # jnp.array COPIES (jnp.asarray zero-copy-aliases float64 numpy views
    # of torch parameter memory; torch's in-place opt.step() would then
    # corrupt async-deferred jax computations reading them)
    stats = {"features": jax.tree_util.tree_map(jnp.array, bs)}
    params = jax.tree_util.tree_map(jnp.array, params)

    criterion = {
        "CeLoss": {"loss_weight": 1.0, "reduction": "mean"},
        "ClusterPatch": {"loss_weight": 0.8, "reduction": "mean"},
        "SeparationPatch": {"loss_weight": 0.08, "reduction": "mean"},
        "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
    }
    bundle = LossBundle(criterion, num_classes=K, abstain_class=False,
                        variant="protopnet")
    tx = make_adam(weight_decay_by_group={g: WD for g in GROUPS},
                   params=params, eps=ADAM_EPS)
    steps = {}
    for stage in ("warm", "joint", "last"):
        steps[stage] = make_protopnet_steps(
            model, bundle, tx, accumulation_steps=1, stage=stage,
            donate=False)
    push_step = steps["joint"][2]
    lrs = {g: jnp.asarray(LR, jnp.float64) for g in GROUPS}
    ident = prototype_class_identity(P, K)

    state = TrainState.create(params, stats, tx)
    opt_states = {s: tx.init(params) for s in ("warm", "joint", "last")}
    accs = {s: state.acc for s in ("warm", "joint", "last")}

    def run_stage(stage, n_steps):
        nonlocal state
        st = state.replace(opt_state=opt_states[stage], acc=accs[stage])
        step_fn = steps[stage][0]
        for i, (x, y) in enumerate(batches[:n_steps]):
            st, m = step_fn(st, jnp.asarray(x), jnp.asarray(y),
                            jnp.ones(B, bool), jax.random.PRNGKey(0), lrs)
            opts[stage].zero_grad()
            xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
            lt = torch_ppnet_loss(tm, xt, torch.tensor(y), ident)
            lt.backward()
            opts[stage].step()
            np.testing.assert_allclose(
                float(m["loss_all"]), float(lt.detach()), rtol=1e-6,
                err_msg=f"{stage} step {i} loss")
        opt_states[stage] = st.opt_state
        accs[stage] = st.acc
        state = state.replace(params=st.params, batch_stats=st.batch_stats)

    # warm: backbone bitwise-frozen
    conv0 = np.asarray(params["features"]["conv1"]["kernel"]).copy()
    run_stage("warm", 2)
    np.testing.assert_array_equal(
        np.asarray(state.params["features"]["conv1"]["kernel"]), conv0,
        err_msg="warm must not touch backbone")
    _compare(state.params, tm, "after warm")

    run_stage("joint", 2)
    _compare(state.params, tm, "after joint")

    # patch push + replacement
    loader = [
        {"cine": jnp.asarray(x), "target_AS": y.astype(np.int32),
         "valid": np.ones(B, bool)}
        for x, y in batches
    ]
    new_params, info = push_prototypes_patch(
        loader, push_step, state.params, state.batch_stats, model,
        class_identity=ident, render=False, img_size=IMG,
        replace_prototypes=True)
    state = state.replace(params=new_params)
    _torch_patch_push(tm, batches, ident)
    _compare(state.params, tm, "after patch push")

    # last-only: prototypes/backbone bitwise-frozen
    proto0 = np.asarray(state.params["prototype_vectors"]).copy()
    run_stage("last", 3)
    np.testing.assert_array_equal(
        np.asarray(state.params["prototype_vectors"]), proto0,
        err_msg="last-only must not touch prototypes")
    _compare(state.params, tm, "after last-only")

    # joint Adam moments persisted through push/last. Looser atol: after
    # push a prototype's distance to its own source patch is EXACTLY 0 —
    # the relu(x2-2xw+p2) boundary where the gradient is mathematically
    # ill-defined and the log-activation derivative (~ -1/EPS = -1e4)
    # amplifies each framework's last-bit noise; a real optimizer-state
    # bug shows at the lr scale (1e-3).
    run_stage("joint", 1)
    _compare(state.params, tm, "after joint resume", atol=2e-5)

    print("PROTOPNET_TRAJECTORY_OK")


if __name__ == "__main__":
    main()
