"""Loss-library golden tests: each term vs an independent torch
re-implementation of the reference semantics (loss.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from protoasnet_tpu.losses import losses as L

RNG = np.random.default_rng(11)


def test_ce_loss_matches_torch():
    logits = RNG.normal(size=(6, 4)).astype(np.float32)
    target = RNG.integers(0, 4, size=6)
    ours = float(L.ce_loss(jnp.asarray(logits), jnp.asarray(target), "mean"))
    ref = float(F.cross_entropy(torch.tensor(logits), torch.tensor(target)))
    assert abs(ours - ref) < 1e-5


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_cluster_and_separation_roi(reduction):
    n, k, per = 5, 4, 3
    sim = RNG.uniform(0, 1, size=(n, k * per)).astype(np.float32)
    target = RNG.integers(0, k, size=n)

    # torch reference semantics
    sim_t = torch.tensor(sim).reshape(n, k, per)
    one_hot = F.one_hot(torch.tensor(target), num_classes=k).float()
    class_max = sim_t.max(dim=2).values
    pos = -(class_max * one_hot)
    neg_onehot = one_hot.clone()
    cluster_ref = pos.mean(dim=0).sum() if reduction == "mean" else pos.sum()
    ours = float(L.cluster_roi(jnp.asarray(sim), jnp.asarray(target), k, reduction))
    assert abs(ours - float(cluster_ref)) < 1e-5

    # separation without abstain
    neg = class_max * (1 - one_hot)
    sep_ref = neg.mean(dim=0).sum() if reduction == "mean" else neg.sum()
    ours = float(L.separation_roi(jnp.asarray(sim), jnp.asarray(target), k,
                                  reduction, abstain_class=False))
    assert abs(ours - float(sep_ref)) < 1e-5

    # separation with abstain: last class exempt
    oh_ab = one_hot.clone()
    oh_ab[:, -1] = 1
    neg_ab = class_max * (1 - oh_ab)
    sep_ab_ref = neg_ab.mean(dim=0).sum() if reduction == "mean" else neg_ab.sum()
    ours = float(L.separation_roi(jnp.asarray(sim), jnp.asarray(target), k,
                                  reduction, abstain_class=True))
    assert abs(ours - float(sep_ab_ref)) < 1e-5


def test_cluster_and_separation_patch():
    n, k, per = 4, 3, 2
    dist = RNG.uniform(0, 5, size=(n, k * per)).astype(np.float32)
    target = RNG.integers(0, k, size=n)
    dist_t = torch.tensor(dist).reshape(n, k, per)
    one_hot = F.one_hot(torch.tensor(target), num_classes=k).float()
    class_min = dist_t.min(dim=2).values
    ref_cluster = (class_min * one_hot).mean(dim=0).sum()
    ref_sep = -(class_min * (1 - one_hot)).mean(dim=0).sum()
    assert abs(float(L.cluster_patch(jnp.asarray(dist), jnp.asarray(target), k,
                                     "mean")) - float(ref_cluster)) < 1e-5
    assert abs(float(L.separation_patch(jnp.asarray(dist), jnp.asarray(target), k,
                                        "mean")) - float(ref_sep)) < 1e-5


@pytest.mark.parametrize("mode", ["per_class", "all"])
def test_orthogonality(mode):
    k, per, d = 3, 4, 8
    pv = RNG.normal(size=(k * per, d)).astype(np.float32)
    pv_t = torch.tensor(pv)
    if mode == "per_class":
        g = pv_t.reshape(k, per, d)
        cos = torch.nn.CosineSimilarity(dim=3)
        sim = cos(g.unsqueeze(1), g.unsqueeze(2))  # (k, per, per)
        ref = torch.triu(sim, diagonal=1).sum()
    else:
        cos = torch.nn.CosineSimilarity(dim=2)
        sim = cos(pv_t.unsqueeze(1), pv_t.unsqueeze(0))
        ref = torch.triu(sim, diagonal=1).sum()
    ours = float(L.orthogonality_loss(jnp.asarray(pv), k, mode))
    assert abs(ours - float(ref)) < 1e-4


def test_l_norm_occurrence_video():
    n, t, h, w, p = 2, 3, 4, 4, 6
    occ = np.abs(RNG.normal(size=(n, t, h, w, p))).astype(np.float32)
    # torch reference: occ (N, P, 1, T, H, W), norm dim (-3,-2,-1), 'mean'
    occ_t = torch.tensor(occ).permute(0, 4, 1, 2, 3).unsqueeze(2)
    ref = occ_t.norm(p=2, dim=(-3, -2, -1)).mean(dim=0).sum()
    ours = float(L.l_norm_occurrence(jnp.asarray(occ), p=2, reduction="mean"))
    assert abs(ours - float(ref)) < 1e-4


def test_l_norm_fc_masked():
    from protoasnet_tpu.models.layers import prototype_class_identity

    p, k = 8, 4
    kernel = RNG.normal(size=(p, k)).astype(np.float32)
    ident = prototype_class_identity(p, k)
    # torch: weight (K, P), mask 1 - identity^T, L1 over everything, sum
    w_t = torch.tensor(kernel.T)
    mask = 1 - torch.tensor(ident.T)
    ref = (mask * w_t).norm(p=1)
    ours = float(L.l_norm_fc(jnp.asarray(kernel), jnp.asarray(ident), p=1))
    assert abs(ours - float(ref)) < 1e-5


@pytest.mark.parametrize("path", ["joined", "separate"])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_ce_abstain_matches_torch(path, reduction):
    n, k = 7, 3  # 3 real classes + 1 abstain logit
    logits = RNG.normal(size=(n, k + 1)).astype(np.float32)
    target = RNG.integers(0, k, size=n)

    lt = torch.tensor(logits)
    tt = torch.tensor(target)
    if path == "joined":
        abs_pred = lt.softmax(dim=1)[:, k : k + 1]
    else:
        abs_pred = lt.sigmoid()[:, k : k + 1]
    class_pred = lt[:, :k].softmax(dim=1)
    oh = F.one_hot(tt, num_classes=k)
    virtual = (1 - abs_pred) * class_pred + abs_pred * oh
    nll = F.nll_loss(torch.log(virtual), tt, reduction=reduction)
    labs = -torch.log(1 - abs_pred).squeeze()
    labs = labs.mean() if reduction == "mean" else labs.sum()
    ref = float(nll + 0.3 * labs)

    ours = float(L.ce_loss_abstain(jnp.asarray(logits), jnp.asarray(target),
                                   ab_weight=0.3, ab_logitpath=path,
                                   reduction=reduction))
    assert abs(ours - ref) < 1e-4


def test_transform_loss_equivariant_map_is_zero():
    """If occ_fn is exactly equivariant (identity on the input), the loss
    must be ~0 — the occurrence of the transformed input equals the
    transformed occurrence."""
    n, t, h, w = 2, 2, 12, 12
    x = RNG.uniform(0.1, 0.9, size=(n, t, h, w, 3)).astype(np.float32)
    occ = x[..., :2]  # pretend P=2 occurrence = first two channels

    def occ_fn(xx):
        return xx[..., :2]

    loss = float(L.transform_loss(jnp.asarray(x), jnp.asarray(occ), occ_fn,
                                  jax.random.PRNGKey(0), reduction="mean"))
    assert loss < 1e-4


def test_transform_loss_nonzero_for_non_equivariant():
    n, t, h, w = 1, 2, 16, 16
    x = RNG.uniform(0, 1, size=(n, t, h, w, 3)).astype(np.float32)
    occ = np.abs(RNG.normal(size=(n, t, 8, 8, 4))).astype(np.float32)

    def occ_fn(xx):
        # constant map independent of input -> not equivariant
        return jnp.ones((n, t, 8, 8, 4), jnp.float32)

    loss = float(L.transform_loss(jnp.asarray(x), jnp.asarray(occ), occ_fn,
                                  jax.random.PRNGKey(1), reduction="sum"))
    assert loss > 0.1


def test_bundle_zero_weights_skip_terms():
    from protoasnet_tpu.losses.bundle import LossBundle
    from protoasnet_tpu.models.layers import prototype_class_identity

    cfg = {
        "CeLoss": {"loss_weight": 1, "reduction": "mean"},
        "ClusterRoiFeat": {"loss_weight": 0.0},
        "SeparationRoiFeat": {"loss_weight": 0.0},
        "OrthogonalityLoss": {"loss_weight": 0.0},
        "Lnorm_occurrence": {"loss_weight": 0.0},
        "trans_occurrence": {"loss_weight": 0.0},
        "Lnorm_FC": {"loss_weight": 0.0},
    }
    bundle = LossBundle(cfg, num_classes=4, abstain_class=False)
    logits = jnp.asarray(RNG.normal(size=(3, 4)).astype(np.float32))
    sim = jnp.asarray(RNG.uniform(0, 1, size=(3, 8)).astype(np.float32))
    occ = jnp.ones((3, 2, 2, 2, 8), jnp.float32)
    target = jnp.asarray([0, 1, 2])
    ident = jnp.asarray(prototype_class_identity(8, 4))
    total, terms = bundle.xprotonet_terms(
        logits, sim, occ, target, jnp.ones((8, 16)), jnp.ones((8, 4)), ident
    )
    assert float(terms["loss_Clst"]) == 0.0
    assert float(terms["loss_RoiTrans"]) == 0.0
    assert float(total) == pytest.approx(float(terms["loss_CE"]))
