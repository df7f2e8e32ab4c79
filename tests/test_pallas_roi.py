"""Pallas fused ROI+cosine head: parity vs the XLA path (interpret mode on
CPU; the compiled kernel is exercised by bench.py --head pallas on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.ops.pallas_roi import roi_cosine_pallas
from protoasnet_tpu.ops.roi_cosine import roi_cosine_head


def _data(seed=0, n=2, t=2, h=3, w=3, d=16, p=6):
    rng = np.random.default_rng(seed)
    occ = np.abs(rng.normal(size=(n, t, h, w, p))).astype(np.float32)
    feat = rng.normal(size=(n, t, h, w, d)).astype(np.float32)
    protos = rng.normal(size=(p, d)).astype(np.float32)
    return jnp.asarray(occ), jnp.asarray(feat), jnp.asarray(protos)


def test_forward_matches_xla():
    occ, feat, protos = _data()
    roi_p, sim_p = roi_cosine_pallas(occ, feat, protos, interpret=True)
    roi_x, sim_x = roi_cosine_head(occ, feat, protos, impl="xla")
    np.testing.assert_allclose(np.asarray(roi_p), np.asarray(roi_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sim_p), np.asarray(sim_x),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_xla():
    occ, feat, protos = _data(seed=1)

    def loss_pallas(occ, feat, protos):
        roi, sim = roi_cosine_pallas(occ, feat, protos, interpret=True)
        return jnp.sum(sim**2) + 0.1 * jnp.sum(roi**2)

    def loss_xla(occ, feat, protos):
        roi, sim = roi_cosine_head(occ, feat, protos, impl="xla")
        return jnp.sum(sim**2) + 0.1 * jnp.sum(roi**2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(occ, feat, protos)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(occ, feat, protos)
    for a, b, name in zip(g_p, g_x, ["occ", "feat", "protos"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_model_with_pallas_head():
    from protoasnet_tpu.models.builder import build_model, init_model

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (8, 32, 1, 1, 1),
           "num_classes": 4, "img_size": 32, "head_impl": "pallas"}
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 8, 32, 32, 3)),
                    jnp.float32)
    params, stats = init_model(model, x, seed=0)
    logits, sim, occ = model.apply({"params": params, "batch_stats": stats},
                                   x, train=False)
    cfg_xla = dict(cfg, head_impl="xla")
    model_x = build_model(cfg_xla)
    logits_x, sim_x, _ = model_x.apply({"params": params, "batch_stats": stats},
                                       x, train=False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sim), np.asarray(sim_x),
                               rtol=1e-4, atol=1e-5)


def test_l2_min_pallas_matches_xla():
    from protoasnet_tpu.ops.l2conv import l2_patch_distances
    from protoasnet_tpu.ops.pallas_l2 import l2_min_pallas

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 4, 5, 16)).astype(np.float32))
    protos = jnp.asarray(rng.normal(size=(6, 1, 1, 16)).astype(np.float32))
    dist_p, min_p = l2_min_pallas(x, protos, interpret=True)
    dist_x = l2_patch_distances(x, protos)
    np.testing.assert_allclose(np.asarray(dist_p), np.asarray(dist_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(min_p),
                               np.asarray(jnp.min(dist_x, axis=(1, 2))),
                               rtol=1e-4, atol=1e-4)


def test_l2_min_pallas_gradients_match_xla():
    from protoasnet_tpu.ops.l2conv import l2_patch_distances
    from protoasnet_tpu.ops.pallas_l2 import l2_min_pallas

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 3, 3, 8)).astype(np.float32))
    protos = jnp.asarray(rng.normal(size=(4, 1, 1, 8)).astype(np.float32))

    def loss_p(x, w):
        dist, mind = l2_min_pallas(x, w, interpret=True)
        return jnp.sum(jnp.log((mind + 1) / (mind + 1e-4))) + 0.01 * dist.sum()

    def loss_x(x, w):
        dist = l2_patch_distances(x, w)
        mind = jnp.min(dist, axis=(1, 2))
        return jnp.sum(jnp.log((mind + 1) / (mind + 1e-4))) + 0.01 * dist.sum()

    g_p = jax.grad(loss_p, argnums=(0, 1))(x, protos)
    g_x = jax.grad(loss_x, argnums=(0, 1))(x, protos)
    np.testing.assert_allclose(np.asarray(g_p[0]), np.asarray(g_x[0]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_p[1]).reshape(4, 8),
                               np.asarray(g_x[1]).reshape(4, 8),
                               rtol=1e-3, atol=1e-4)


def test_ppnet_with_pallas_head():
    from protoasnet_tpu.models.builder import build_model, init_model

    cfg = {"name": "ProtoPNet", "base_architecture": "resnet18",
           "prototype_shape": (6, 64, 1, 1), "num_classes": 3, "img_size": 64,
           "add_on_layers_type": "regular"}
    m_x = build_model(dict(cfg, head_impl="xla"))
    m_p = build_model(dict(cfg, head_impl="pallas"))
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    params, stats = init_model(m_x, x, seed=0)
    lx, dx = m_x.apply({"params": params, "batch_stats": stats}, x, train=False)
    lp, dp = m_p.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lp), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dp), rtol=1e-4,
                               atol=1e-4)
