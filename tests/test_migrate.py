"""Trained-reference-checkpoint migration: a torch model saved with the
REFERENCE's module/key layout converts into our params and reproduces its
forward outputs at fp32 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from protoasnet_tpu.models.builder import build_model, init_model
from protoasnet_tpu.models.migrate import convert_reference_state_dict
from tests.test_torch_import import TVR2Plus1D, TVResNet18Features

P, D, K = 8, 64, 4


class RefVideoXProtoNet(nn.Module):
    """Module layout + key names of the reference Video_XProtoNet
    (cnn_backbone.backbone Sequential wrapper, numbered head Sequentials)."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(11)
        trunk = TVR2Plus1D(num_stages=3)
        wrapper = nn.Module()
        wrapper.backbone = nn.Sequential(trunk.stem, trunk.layer1,
                                         trunk.layer2, trunk.layer3)
        self.cnn_backbone = wrapper
        self.add_on_layers = nn.Sequential(
            nn.Conv3d(256, D, 1), nn.ReLU(), nn.Conv3d(D, D, 1))
        self.occurrence_module = nn.Sequential(
            nn.Conv3d(256, D, 1), nn.ReLU(), nn.Conv3d(D, D // 2, 1),
            nn.ReLU(), nn.Conv3d(D // 2, P, 1, bias=False))
        self.prototype_vectors = nn.Parameter(torch.rand(P, D, 1, 1, 1))
        self.ones = nn.Parameter(torch.ones(P, D, 1, 1, 1),
                                 requires_grad=False)
        self.last_layer = nn.Linear(P, K, bias=False)
        self.cos = nn.CosineSimilarity(dim=2)

    def forward(self, x):
        f = self.cnn_backbone.backbone(x)
        feat = self.add_on_layers(f).unsqueeze(1)
        occ = torch.abs(self.occurrence_module(f)).unsqueeze(2)
        roi = (occ * feat).sum(dim=(3, 4, 5))
        sim = (self.cos(roi, self.prototype_vectors.squeeze().unsqueeze(0)) + 1) / 2
        return self.last_layer(sim), sim, occ


def test_migrate_video_xprotonet_forward_parity():
    ref = RefVideoXProtoNet().eval()
    sd = ref.state_dict()

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (P, D, 1, 1, 1),
           "num_classes": K, "img_size": 32}
    params, stats = convert_reference_state_dict(sd, cfg)
    model = build_model(cfg)
    # structure check against a fresh init
    x = np.random.default_rng(8).normal(size=(2, 8, 32, 32, 3)).astype(np.float32)
    ref_init, _ = init_model(model, jnp.asarray(x[:1]), seed=0)
    import jax

    assert (jax.tree_util.tree_structure(ref_init)
            == jax.tree_util.tree_structure(
                jax.tree_util.tree_map(jnp.asarray, params)))

    logits, sim, occ = jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(
            {"params": params, "batch_stats": stats}, jnp.asarray(x))
    with torch.no_grad():
        lt, st, ot = ref(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3))))
    np.testing.assert_allclose(np.asarray(logits), lt.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sim), st.numpy(),
                               rtol=1e-3, atol=1e-4)


class RefPPNet(nn.Module):
    """Reference PPNet layout ('features' backbone, regular add-ons)."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(12)
        self.features = TVResNet18Features()
        self.add_on_layers = nn.Sequential(
            nn.Conv2d(512, D, 1), nn.ReLU(), nn.Conv2d(D, D, 1), nn.Sigmoid())
        self.prototype_vectors = nn.Parameter(torch.rand(6, D, 1, 1))
        self.last_layer = nn.Linear(6, 3, bias=False)

    def forward(self, x):
        f = self.add_on_layers(self.features(x))
        x2 = (f ** 2).sum(dim=1, keepdim=True)
        w = self.prototype_vectors
        xw = nn.functional.conv2d(f, w)
        p2 = (w ** 2).sum(dim=(1, 2, 3)).view(-1, 1, 1)
        dist = torch.relu(x2 - 2 * xw + p2)
        min_d = -nn.functional.max_pool2d(-dist, dist.shape[2:]).flatten(1)
        act = torch.log((min_d + 1) / (min_d + 1e-4))
        return self.last_layer(act), min_d


def test_migrate_ppnet_forward_parity():
    ref = RefPPNet().eval()
    cfg = {"name": "ProtoPNet", "base_architecture": "resnet18",
           "prototype_shape": (6, D, 1, 1), "num_classes": 3, "img_size": 64,
           "add_on_layers_type": "regular"}
    params, stats = convert_reference_state_dict(ref.state_dict(), cfg)
    model = build_model(cfg)
    import jax

    x = np.random.default_rng(9).normal(size=(2, 64, 64, 3)).astype(np.float32)
    logits, min_d = jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(
            {"params": params, "batch_stats": stats}, jnp.asarray(x))
    with torch.no_grad():
        lt, dt = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(min_d), dt.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(logits), lt.numpy(),
                               rtol=1e-3, atol=1e-3)


def _assert_trees_equal(a, b):
    import jax

    assert (jax.tree_util.tree_structure(a)
            == jax.tree_util.tree_structure(b))
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)), a, b)


def test_export_reference_roundtrip_video():
    """Reverse migration: our trees -> reference-layout state dict that
    (a) strict-loads into the reference-layout torch twin and (b) converts
    back to bit-identical trees — users can move checkpoints in either
    direction."""
    from protoasnet_tpu.models.migrate import export_reference_state_dict

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (P, D, 1, 1, 1),
           "num_classes": K, "img_size": 32}
    model = build_model(cfg)
    params, stats = init_model(model, jnp.zeros((1, 8, 32, 32, 3)), seed=2)
    sd = export_reference_state_dict(params, stats, cfg)

    ref = RefVideoXProtoNet()
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)

    p2, s2 = convert_reference_state_dict(sd, cfg)
    _assert_trees_equal(params, p2)
    _assert_trees_equal(stats, s2)


def test_export_reference_roundtrip_ppnet():
    from protoasnet_tpu.models.migrate import export_reference_state_dict

    cfg = {"name": "ProtoPNet", "base_architecture": "resnet18",
           "prototype_shape": (6, D, 1, 1), "num_classes": 3, "img_size": 64,
           "add_on_layers_type": "regular"}
    model = build_model(cfg)
    params, stats = init_model(model, jnp.zeros((1, 64, 64, 3)), seed=3)
    sd = export_reference_state_dict(params, stats, cfg)

    ref = RefPPNet()
    # the twin omits the reference's constant 'ones' param; everything
    # else must match strictly
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=False)
    assert missing == [] and unexpected == ["ones"]

    p2, s2 = convert_reference_state_dict(sd, cfg)
    _assert_trees_equal(params, p2)
    _assert_trees_equal(stats, s2)


def test_migrated_checkpoint_loads_into_agent(synthetic_csv, tmp_path):
    """Full migration loop: reference-layout .pth -> migrate CLI ->
    agent --model.checkpoint_path=<pickle> -> identical logits."""
    import os

    from protoasnet_tpu.models.migrate import main as migrate_main
    from protoasnet_tpu.train.agents import build_agent

    ref = RefVideoXProtoNet().eval()
    pth = str(tmp_path / "ref_last.pth")
    torch.save({"epoch": 7, "iteration": 123, "state_dict": ref.state_dict()},
               pth)

    import yaml

    cfg = {
        "agent": "Video_XProtoNet_e2e", "abstain_class": True,
        "wandb_mode": "disabled", "run_name": "m",
        "save_dir": str(tmp_path / "logs"), "render_prototypes": False,
        "model": {"checkpoint_path": "", "name": "Video_XProtoNet",
                  "base_architecture": "resnet2p1d_18",
                  "backbone_last_layer_num": -3,
                  "prototype_shape": f"({P}, {D}, 1, 1, 1)", "num_classes": K},
        "train": {"seed": 0, "num_train_epochs": 1, "save": True,
                  "save_step": None, "num_warm_epochs": 0, "batch_size": 4,
                  "accumulation_steps": 1, "push_start": 99, "push_rate": 1,
                  "auto_resume": False,
                  "criterion": {"CeLossAbstain": {"loss_weight": 1},
                                "Lnorm_FC": {"p": 1, "loss_weight": 0}},
                  "optimizer": {"name": "Adam", "mode": "lr_same",
                                "lr_same": 1e-4},
                  "lr_schedule": {"name": "StepLR", "step_size": 5,
                                  "gamma": 0.1}},
        "data": {"data_info_file": synthetic_csv, "sample_size": None,
                 "sampler": "AS", "view": "all", "augmentation": False,
                 "normalize": True, "img_size": 32, "frames": 8,
                 "iterate_intervals": True, "interval_unit": "cycle",
                 "interval_quant": 1.0},
    }
    cfg_path = str(tmp_path / "cfg.yml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    out_pkl = str(tmp_path / "migrated.pickle")
    migrate_main([pth, out_pkl, f"--config_path={cfg_path}"])
    assert os.path.exists(out_pkl)

    cfg["model"]["checkpoint_path"] = out_pkl
    agent = build_agent(cfg)
    assert agent.current_epoch == 7

    x = np.random.default_rng(10).normal(size=(1, 8, 32, 32, 3)).astype(np.float32)
    logits, _, _ = agent.model.apply(
        {"params": agent.params, "batch_stats": agent.batch_stats},
        jnp.asarray(x), train=False)
    with torch.no_grad():
        lt, _, _ = ref(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3))))
    np.testing.assert_allclose(np.asarray(logits), lt.numpy(),
                               rtol=1e-3, atol=1e-4)
