"""Full-model GRADIENT parity vs torch.

Forward parity (test_torch_import) + per-loss parity (test_losses) +
optimizer parity (test_optim) compose here into the strongest training
equivalence check: identical weights -> identical loss AND identical
gradients through the entire ProtoASNet-Video network (backbone +
occurrence + prototype head + readout) under the combined objective
CE-abstain + cluster + separation + L1(FC). fp32, CPU, train-mode BN.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from protoasnet_tpu.losses import losses as L
from protoasnet_tpu.models.builder import build_model, init_model
from protoasnet_tpu.models.layers import prototype_class_identity
from protoasnet_tpu.models.torch_import import convert_r2plus1d
from tests.test_torch_import import TVR2Plus1D

P, D, K = 8, 64, 4  # 4 classes incl. abstain
AB_W = 0.3


class TorchProtoASNet(nn.Module):
    """torchvision-layout trunk + reference-style head
    (Video_XProtoNet.py:82-98 semantics)."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.trunk = TVR2Plus1D(num_stages=3)
        self.add_on = nn.Sequential(nn.Conv3d(256, D, 1), nn.ReLU(),
                                    nn.Conv3d(D, D, 1))
        self.occ = nn.Sequential(nn.Conv3d(256, D, 1), nn.ReLU(),
                                 nn.Conv3d(D, D // 2, 1), nn.ReLU(),
                                 nn.Conv3d(D // 2, P, 1, bias=False))
        self.prototypes = nn.Parameter(torch.rand(P, D))
        self.fc = nn.Linear(P, K, bias=False)
        self.cos = nn.CosineSimilarity(dim=2)

    def forward(self, x):  # x (N, 3, T, H, W)
        f = self.trunk(x)
        feat = self.add_on(f).unsqueeze(1)  # (N,1,D,T,H,W)
        occ = torch.abs(self.occ(f)).unsqueeze(2)  # (N,P,1,T,H,W)
        roi = (occ * feat).sum(dim=(3, 4, 5))
        sim = (self.cos(roi, self.prototypes.unsqueeze(0)) + 1) / 2
        return self.fc(sim), sim, occ


def torch_loss(model, x, y, ident):
    logits, sim, occ = model(x)
    k = K - 1
    abs_pred = logits.softmax(dim=1)[:, k: k + 1]
    class_pred = logits[:, :k].softmax(dim=1)
    oh = F.one_hot(y, num_classes=k)
    virtual = (1 - abs_pred) * class_pred + abs_pred * oh
    ce = F.nll_loss(torch.log(virtual), y) + AB_W * (-torch.log(1 - abs_pred)).mean()
    sim_g = sim.reshape(len(y), K, -1)
    oh_full = F.one_hot(y, num_classes=K).float()
    cls_max = sim_g.max(dim=2).values
    cluster = -(cls_max * oh_full).mean(dim=0).sum()
    oh_ab = oh_full.clone()
    oh_ab[:, -1] = 1
    sep = (cls_max * (1 - oh_ab)).mean(dim=0).sum()
    mask = 1 - torch.tensor(ident.T)
    l1 = (mask * model.fc.weight).norm(p=1)
    return ce + 0.8 * cluster + 0.08 * sep + 1e-4 * l1


def _import_head(tm: TorchProtoASNet, params):
    """Copy torch head weights into our param tree (conv1x1x1 -> Dense)."""
    def w(conv):  # (O, I, 1,1,1) -> (I, O)
        return np.asarray(conv.weight.detach()).reshape(conv.out_channels, -1).T

    p = dict(params)
    p["add_on_layers"] = {
        "Dense_0": {"kernel": w(tm.add_on[0]), "bias": np.asarray(tm.add_on[0].bias.detach())},
        "Dense_1": {"kernel": w(tm.add_on[2]), "bias": np.asarray(tm.add_on[2].bias.detach())},
    }
    p["occurrence_module"] = {
        "Dense_0": {"kernel": w(tm.occ[0]), "bias": np.asarray(tm.occ[0].bias.detach())},
        "Dense_1": {"kernel": w(tm.occ[2]), "bias": np.asarray(tm.occ[2].bias.detach())},
        "Dense_2": {"kernel": w(tm.occ[4])},
    }
    p["prototype_vectors"] = np.asarray(tm.prototypes.detach())
    p["last_layer"] = {"Dense_0": {"kernel": np.asarray(tm.fc.weight.detach()).T}}
    return p


def test_full_model_loss_and_grad_parity():
    tm = TorchProtoASNet()
    tm.eval()  # eval-mode BN on both sides (isolates BN-stats bookkeeping)

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (P, D, 1, 1, 1),
           "num_classes": K, "img_size": 32}
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 8, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, K - 1, size=3)
    params, stats = init_model(model, jnp.asarray(x[:1]), seed=0)

    bp, bs = convert_r2plus1d({k: v.numpy() for k, v in tm.trunk.state_dict().items()},
                              num_stages=3)
    params = _import_head(tm, params)
    params["cnn_backbone"] = bp
    stats = {"cnn_backbone": bs}
    # jnp.array copies (asarray would alias torch param memory; see
    # tests/trajectory_driver.py)
    params = jax.tree_util.tree_map(jnp.array, params)
    stats = jax.tree_util.tree_map(jnp.array, stats)

    ident = prototype_class_identity(P, K)

    def jax_loss(p):
        logits, sim, occ = model.apply({"params": p, "batch_stats": stats},
                                       jnp.asarray(x), train=False)
        ce = L.ce_loss_abstain(logits, jnp.asarray(y), ab_weight=AB_W,
                               ab_logitpath="joined", reduction="mean")
        cluster = L.cluster_roi(sim, jnp.asarray(y), K, "mean")
        sep = L.separation_roi(sim, jnp.asarray(y), K, "mean", abstain_class=True)
        l1 = L.l_norm_fc(p["last_layer"]["Dense_0"]["kernel"], jnp.asarray(ident))
        return ce + 0.8 * cluster + 0.08 * sep + 1e-4 * l1

    # jitted: the eager grad would dispatch ~400 op-level programs (~25 s
    # on this 1-core host); one compiled program is ~2 s warm-cache
    loss_j, grads = jax.jit(jax.value_and_grad(jax_loss))(params)

    xt = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)), requires_grad=False)
    loss_t = torch_loss(tm, xt, torch.tensor(y), ident)
    loss_t.backward()

    assert abs(float(loss_j) - float(loss_t)) < 2e-4, (float(loss_j), float(loss_t))

    # gradient parity at the four corners of the network
    g_proto = np.asarray(grads["prototype_vectors"])
    np.testing.assert_allclose(g_proto, tm.prototypes.grad.numpy(),
                               rtol=1e-3, atol=1e-5, err_msg="prototype grads")
    g_fc = np.asarray(grads["last_layer"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(g_fc, tm.fc.weight.grad.numpy().T,
                               rtol=1e-3, atol=1e-5, err_msg="fc grads")
    g_occ = np.asarray(grads["occurrence_module"]["Dense_2"]["kernel"])
    ref = tm.occ[4].weight.grad.numpy().reshape(P, -1).T
    np.testing.assert_allclose(g_occ, ref, rtol=2e-3, atol=1e-5,
                               err_msg="occurrence grads")
    g_stem = np.asarray(grads["cnn_backbone"]["stem_spatial"]["kernel"])
    ref = np.transpose(tm.trunk.stem[0].weight.grad.numpy(), (2, 3, 4, 1, 0))
    np.testing.assert_allclose(g_stem, ref, rtol=5e-3, atol=1e-6,
                               err_msg="backbone stem grads")
