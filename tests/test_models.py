import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protoasnet_tpu.models.builder import build_model, init_model
from protoasnet_tpu.models.layers import (
    incorrect_connection_kernel,
    prototype_class_identity,
)


def test_prototype_class_identity():
    ident = prototype_class_identity(8, 4)
    assert ident.shape == (8, 4)
    assert (ident.sum(axis=1) == 1).all()
    assert (ident[:2, 0] == 1).all() and (ident[6:, 3] == 1).all()
    with pytest.raises(ValueError):
        prototype_class_identity(7, 3)


def test_incorrect_connection_kernel():
    k = incorrect_connection_kernel(4, 2, -0.5)
    assert k[0, 0] == 1.0 and k[0, 1] == -0.5
    assert k[3, 1] == 1.0 and k[3, 0] == -0.5


@pytest.fixture(scope="module")
def image_model():
    cfg = {
        "name": "XProtoNet",
        "base_architecture": "resnet18",
        "prototype_shape": (8, 512, 1, 1),
        "num_classes": 4,
        "img_size": 64,
    }
    model = build_model(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    params, batch_stats = init_model(model, x, seed=0)
    return model, params, batch_stats


@pytest.fixture(scope="module")
def video_model():
    cfg = {
        "name": "Video_XProtoNet",
        "base_architecture": "resnet2p1d_18",
        "backbone_last_layer_num": -3,
        "prototype_shape": (8, 256, 1, 1, 1),
        "num_classes": 4,
        "img_size": 32,
    }
    model = build_model(cfg)
    x = jnp.zeros((2, 8, 32, 32, 3))
    params, batch_stats = init_model(model, x, seed=0)
    return model, params, batch_stats


def test_image_xprotonet_shapes(image_model):
    model, params, batch_stats = image_model
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    logits, sim, occ = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        {"params": params, "batch_stats": batch_stats}, x
    )
    assert logits.shape == (2, 4)
    assert sim.shape == (2, 8)
    assert occ.shape == (2, 2, 2, 8)  # 64/32 = 2 spatial
    assert (np.asarray(sim) >= 0).all() and (np.asarray(sim) <= 1).all()
    assert (np.asarray(occ) >= 0).all()  # absolute-value occurrence


def test_video_xprotonet_shapes(video_model):
    model, params, batch_stats = video_model
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 32, 32, 3)), jnp.float32)
    logits, sim, occ = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        {"params": params, "batch_stats": batch_stats}, x
    )
    assert logits.shape == (2, 4)
    assert sim.shape == (2, 8)
    # r2p1d -3: T/4=2, H/8=4, W/8=4
    assert occ.shape == (2, 2, 4, 4, 8)


def test_push_forward_consistency(video_model):
    model, params, batch_stats = video_model
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 32, 32, 3)), jnp.float32)
    variables = {"params": params, "batch_stats": batch_stats}
    logits, sim, occ = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        variables, x)
    roi, dist, occ2, logits2 = jax.jit(lambda v, xx: model.apply(
        v, xx, train=False, method=model.push_forward))(variables, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dist), 1 - np.asarray(sim), atol=1e-6)
    np.testing.assert_allclose(np.asarray(occ), np.asarray(occ2), atol=1e-6)
    assert roi.shape == (1, 8, 256)


def test_last_layer_initialized_to_identity(video_model):
    model, params, _ = video_model
    kernel = np.asarray(params["last_layer"]["Dense_0"]["kernel"])
    expect = incorrect_connection_kernel(8, 4, 0.0)
    np.testing.assert_allclose(kernel, expect)


def test_roi_head_matches_torch_reference_semantics():
    """Golden parity: ROI pooling + cosine + readout vs a torch
    re-implementation of the reference forward (Video_XProtoNet.py:82-98)."""
    import torch

    rng = np.random.default_rng(3)
    n, t, h, w, d, p, k = 2, 3, 4, 5, 16, 6, 3
    occ = np.abs(rng.normal(size=(n, t, h, w, p))).astype(np.float32)
    feat = rng.normal(size=(n, t, h, w, d)).astype(np.float32)
    protos = rng.normal(size=(p, d)).astype(np.float32)
    fc = rng.normal(size=(k, p)).astype(np.float32)

    from protoasnet_tpu.ops.roi_cosine import roi_cosine_head

    roi, sim = roi_cosine_head(jnp.asarray(occ), jnp.asarray(feat), jnp.asarray(protos))
    logits = np.asarray(sim) @ fc.T

    # torch reference: occ (N,P,1,T,H,W) * feat (N,1,D,T,H,W) summed over T,H,W
    occ_t = torch.tensor(occ).permute(0, 4, 1, 2, 3).unsqueeze(2)
    feat_t = torch.tensor(feat).permute(0, 4, 1, 2, 3).unsqueeze(1)
    roi_t = (occ_t * feat_t).sum(dim=3).sum(dim=3).sum(dim=3)  # (N, P, D)
    cos = torch.nn.CosineSimilarity(dim=2)
    sim_t = (cos(roi_t, torch.tensor(protos).unsqueeze(0)) + 1) / 2
    logits_t = sim_t @ torch.tensor(fc).T

    np.testing.assert_allclose(np.asarray(roi), roi_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sim), sim_t.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(logits, logits_t.numpy(), rtol=1e-4, atol=1e-4)


def test_l2_distances_match_bruteforce():
    from protoasnet_tpu.ops.l2conv import l2_patch_distances

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 5, 5, 8)).astype(np.float32)
    protos = rng.normal(size=(6, 1, 1, 8)).astype(np.float32)
    d = np.asarray(l2_patch_distances(jnp.asarray(x), jnp.asarray(protos)))
    brute = ((x[:, :, :, None, :] - protos[None, None, None, :, 0, 0, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, brute, rtol=1e-3, atol=1e-4)


def test_protopnet_forward_shapes():
    cfg = {
        "name": "ProtoPNet",
        "base_architecture": "resnet18",
        "prototype_shape": (6, 128, 1, 1),
        "num_classes": 3,
        "img_size": 64,
        "prototype_activation_function": "log",
        "add_on_layers_type": "bottleneck",
    }
    model = build_model(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    params, batch_stats = init_model(model, x, seed=0)
    logits, min_d = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        {"params": params, "batch_stats": batch_stats}, x
    )
    assert logits.shape == (2, 3)
    assert min_d.shape == (2, 6)
    assert (np.asarray(min_d) >= 0).all()
    # bottleneck plan for 512 -> 128: add_on has sigmoid output, so conv
    # features bounded in (0,1); distance bounded by D
    conv, dist = jax.jit(lambda v, xx: model.apply(
        v, xx, train=False, method=model.push_forward))(
        {"params": params, "batch_stats": batch_stats}, x
    )
    assert conv.shape == (2, 2, 2, 128)
    assert dist.shape == (2, 2, 2, 6)


def test_backbone_truncation_levels():
    from protoasnet_tpu.models.backbones.r2plus1d import R2Plus1D18

    x = jnp.zeros((1, 8, 32, 32, 3))
    m2 = R2Plus1D18(last_layer_num=-2)
    v = jax.jit(m2.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    out = jax.jit(m2.apply, static_argnames="train")(v, x, train=False)
    assert out.shape == (1, 1, 2, 2, 512)  # T/8, H/16
    assert m2.out_channels == 512


def test_resnet_conv_info_rf_chain():
    from protoasnet_tpu.models.backbones.resnet2d import resnet_features

    ks, ss, ps = resnet_features("resnet18").conv_info()
    # conv1 + maxpool + 8 blocks x 2 convs = 18 entries
    assert len(ks) == 18
    assert ks[0] == 7 and ss[0] == 2 and ps[0] == 3
    assert sum(1 for s in ss if s == 2) == 5  # total stride 32


def test_occurrence_map_softmaxed_variant():
    """Reference get_occurence_map_softmaxed parity (XProtoNet.py:75-80):
    softmax over flattened spatial positions per prototype, applied to
    backbone features."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from protoasnet_tpu.models.builder import build_model, init_model

    cfg = {"name": "XProtoNet", "base_architecture": "resnet18",
           "prototype_shape": (8, 64, 1, 1), "num_classes": 4,
           "img_size": 32}
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3))
                    .astype(np.float32))
    params, stats = init_model(model, x, seed=0)
    variables = {"params": params, "batch_stats": stats}
    fmap = jax.jit(lambda v, xx: model.apply(
        v, xx, train=False,
        method=lambda m, a, train: m.cnn_backbone(a, train)))(variables, x)
    occ_raw = model.apply(variables, fmap,
                          method=lambda m, f: m.occurrence_module(f))
    sm = model.apply(variables, fmap,
                     method=lambda m, f: m.occurrence_map_softmaxed(f))
    n, p = sm.shape[0], sm.shape[-1]
    sums = np.asarray(sm).reshape(n, -1, p).sum(axis=1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)
    # matches torch softmax over flattened spatial dims
    t = torch.softmax(
        torch.tensor(np.asarray(occ_raw).reshape(n, -1, p)), dim=1).numpy()
    np.testing.assert_allclose(np.asarray(sm).reshape(n, -1, p), t,
                               rtol=1e-5, atol=1e-7)
