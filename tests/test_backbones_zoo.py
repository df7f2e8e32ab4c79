import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protoasnet_tpu.models.backbones import make_backbone


@pytest.mark.parametrize("name,out_c", [
    # densenet121's 58-layer compile costs ~50 s on this 1-core host;
    # slow-marked — densenet coverage stays in the fast loop via
    # test_densenet_conv_info + test_protopnet_with_densenet_backbone
    pytest.param("densenet121", 1024, marks=pytest.mark.slow),
    ("vgg11", 512),
    ("vgg11_bn", 512),
])
def test_zoo_shapes(name, out_c):
    model = make_backbone(name)
    assert model.out_channels == out_c
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    apply = jax.jit(model.apply, static_argnames=("train", "mutable"))
    out = apply(variables, x, train=False,
                mutable=("batch_stats",))[0] if "batch_stats" in variables \
        else apply(variables, x, train=False)
    assert out.shape == (1, 2, 2, out_c)  # stride 32


def test_densenet_out_channels_table():
    assert make_backbone("densenet161").out_channels == 2208
    assert make_backbone("densenet169").out_channels == 1664
    assert make_backbone("densenet201").out_channels == 1920


def test_conv_info_chains():
    ks, ss, ps = make_backbone("vgg16").conv_info()
    assert len(ks) == 13 + 5  # 13 convs + 5 pools
    assert sum(1 for s in ss if s == 2) == 5  # vgg: 5 pools -> stride 32
    ks, ss, ps = make_backbone("densenet121").conv_info()
    # conv0 + pool + 2*(6+12+24+16) layers-convs + 3 transitions * 2
    assert len(ks) == 2 + 2 * 58 + 6
    assert sum(1 for s in ss if s == 2) == 5  # conv0+pool+3 transitions


def test_xprotonet_with_vgg_backbone():
    from protoasnet_tpu.models.builder import build_model, init_model

    cfg = {"name": "XProtoNet", "base_architecture": "vgg11",
           "prototype_shape": (6, 128, 1, 1), "num_classes": 3, "img_size": 64}
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    params, stats = init_model(model, x, seed=0)
    logits, sim, occ = jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(
            {"params": params, "batch_stats": stats}, x)
    assert logits.shape == (2, 3) and sim.shape == (2, 6)


@pytest.mark.slow
def test_protopnet_with_densenet_backbone():
    # slow-marked: tracing+compiling the 121-layer densenet costs ~60 s
    # on this host; fast-loop densenet coverage stays via the
    # out_channels table + conv_info chain tests above.
    from protoasnet_tpu.models.builder import build_model, init_model

    cfg = {"name": "ProtoPNet", "base_architecture": "densenet121",
           "prototype_shape": (6, 128, 1, 1), "num_classes": 3, "img_size": 64,
           "add_on_layers_type": "bottleneck"}
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params, stats = init_model(model, x, seed=0)
    logits, min_d = model.apply({"params": params, "batch_stats": stats},
                                x, train=False)
    assert logits.shape == (1, 3)


def test_r3d18_backbone():
    m = make_backbone("r3d_18", last_layer_num=-3)
    assert m.out_channels == 256
    x = jnp.zeros((1, 8, 32, 32, 3))
    v = jax.jit(m.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    out = jax.jit(m.apply, static_argnames="train")(v, x, train=False)
    assert out.shape == (1, 2, 4, 4, 256)  # T/4, H/8 like r2p1d[-3]

    from protoasnet_tpu.models.builder import build_model, init_model

    cfg = {"name": "Video_XProtoNet", "base_architecture": "r3d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (8, 64, 1, 1, 1),
           "num_classes": 4, "img_size": 32}
    model = build_model(cfg)
    params, stats = init_model(model, x, seed=0)
    logits, sim, occ = jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(
            {"params": params, "batch_stats": stats}, x)
    assert logits.shape == (1, 4)
