"""Integration tests for the image-model agents: XProtoNet e2e (frames=1)
and the staged ProtoPNet baseline (warm/joint/push/last + patch push)."""

import os

import numpy as np
import pytest

from protoasnet_tpu.train.agents import build_agent

pytestmark = pytest.mark.slow


def _image_base(csv, tmp):
    return {
        "wandb_mode": "disabled",
        "run_name": "t",
        "save_dir": str(tmp),
        "render_prototypes": False,
        "train": {
            "seed": 2,
            "num_train_epochs": 1,
            "save": True,
            "save_step": None,
            "num_warm_epochs": 0,
            "batch_size": 4,
            "accumulation_steps": 1,
            "push_start": 0,
            "push_rate": 1,
        },
        "data": {
            "data_info_file": csv,
            "sample_size": None,
            "sampler": "AS",
            "view": "all",
            "augmentation": True,
            "transform_rotate_degrees": 10,
            "transform_min_crop_ratio": 0.7,
            "transform_time_dilation": 0.2,
            "normalize": True,
            "img_size": 32,
            "frames": 1,
            "iterate_intervals": True,
            "interval_unit": "image",
            "interval_quant": 1.0,
            "eval_batch_size": 8,
        },
    }


def test_image_xprotonet_e2e(synthetic_csv, tmp_path):
    cfg = _image_base(synthetic_csv, tmp_path)
    cfg.update({
        "agent": "XProtoNet_e2e",
        "abstain_class": True,
        "model": {
            "checkpoint_path": "",
            "name": "XProtoNet",
            "base_architecture": "resnet18",
            "prototype_shape": "(8, 64, 1, 1)",
            "num_classes": 4,
        },
    })
    cfg["train"]["criterion"] = {
        "CeLossAbstain": {"loss_weight": 1, "ab_weight": 0.7,
                          "ab_logitpath": "joined", "reduction": "mean"},
        "ClusterRoiFeat": {"loss_weight": 0.8, "reduction": "mean"},
        "SeparationRoiFeat": {"loss_weight": 0.08, "reduction": "mean"},
        "OrthogonalityLoss": {"loss_weight": 0.01, "mode": "per_class"},
        "Lnorm_occurrence": {"p": 2, "loss_weight": 0.0, "reduction": "mean"},
        "trans_occurrence": {"loss_weight": 0.001, "reduction": "mean"},
        "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
    }
    cfg["train"]["optimizer"] = {"name": "Adam", "mode": "lr_same",
                                 "lr_same": 1e-4}
    cfg["train"]["lr_schedule"] = {"name": "ReduceLROnPlateau", "mode": "max",
                                   "factor": 0.5, "patience": 2,
                                   "threshold": 1e-4, "cooldown": 0,
                                   "min_lr": 1e-6}
    agent = build_agent(cfg)
    agent.train()
    accu, f1, auc = agent.evaluate(mode="test")
    assert 0 <= f1 <= 1
    assert os.path.exists(os.path.join(agent.save_dir, "last.ckpt"))
    # occurrence maps are 2-D for images: (N, H', W', P)
    batch = next(iter(agent.data_loaders["val"]))
    roi, dist, occ, logits = agent.push_step(agent.params, agent.batch_stats,
                                             batch["cine"])
    assert occ.ndim == 4


@pytest.mark.parametrize("agent_name", ["ProtoPNet_Base", "ProtoPNet_e2e"])
def test_protopnet_agents(synthetic_csv, tmp_path, agent_name):
    cfg = _image_base(synthetic_csv, tmp_path / agent_name)
    cfg.update({
        "agent": agent_name,
        "abstain_class": False,
        "model": {
            "checkpoint_path": "",
            "name": "ProtoPNet",
            "base_architecture": "resnet18",
            "prototype_shape": "(6, 64, 1, 1)",
            "num_classes": 3,
            "prototype_activation_function": "log",
            "add_on_layers_type": "regular",
        },
    })
    cfg["train"]["criterion"] = {
        "CeLoss": {"loss_weight": 1, "reduction": "mean"},
        "ClusterPatch": {"loss_weight": 0.8, "reduction": "mean"},
        "SeparationPatch": {"loss_weight": 0.08, "reduction": "mean"},
        "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
    }
    if agent_name == "ProtoPNet_Base":
        cfg["train"]["optimizer"] = {
            "name": "Adam",
            "joint_lrs": {"features": 1e-4, "add_on_layers": 3e-3,
                          "prototype_vectors": 3e-3},
            "warm_lrs": {"add_on_layers": 3e-3, "prototype_vectors": 3e-3},
            "last_layer_lr": 1e-4,
        }
        cfg["train"]["num_warm_epochs"] = 1
        cfg["train"]["num_train_epochs"] = 2
    else:
        cfg["train"]["optimizer"] = {"name": "Adam", "mode": "lr_same",
                                     "lr_same": 1e-4}
    cfg["train"]["lr_schedule"] = {"name": "StepLR", "step_size": 5,
                                   "gamma": 0.1}
    agent = build_agent(cfg)
    agent.train()
    accu, f1, auc = agent.evaluate(mode="test")
    assert 0 <= f1 <= 1
    # patch push wrote bound boxes
    img_dir = os.path.join(agent.save_dir, "img")
    bbs = [os.path.join(r, f) for r, _, fs in os.walk(img_dir)
           for f in fs if f == "bb.npy"]
    assert bbs, "ProtoPNet push must emit bb.npy"
    bb = np.load(bbs[-1])
    assert bb.shape[1] == 5


def test_xprotonet_staged_agent(synthetic_csv, tmp_path):
    """Staged XProtoNet (warm/joint/push/last, 3 optimizer states,
    XProtoNet_Base.train parity)."""
    cfg = _image_base(synthetic_csv, tmp_path / "staged")
    cfg.update({
        "agent": "XProtoNet_Base",
        "abstain_class": True,
        "model": {
            "checkpoint_path": "",
            "name": "XProtoNet",
            "base_architecture": "resnet18",
            "prototype_shape": "(8, 64, 1, 1)",
            "num_classes": 4,
        },
    })
    cfg["train"].update({
        "num_train_epochs": 2,
        "num_warm_epochs": 1,
        "push_start": 1,
        "push_rate": 1,
    })
    cfg["train"]["criterion"] = {
        "CeLossAbstain": {"loss_weight": 1, "ab_weight": 0.7,
                          "ab_logitpath": "joined", "reduction": "mean"},
        "ClusterRoiFeat": {"loss_weight": 0.8, "reduction": "mean"},
        "SeparationRoiFeat": {"loss_weight": 0.08, "reduction": "mean"},
        "OrthogonalityLoss": {"loss_weight": 0.01, "mode": "per_class"},
        "Lnorm_occurrence": {"p": 2, "loss_weight": 0.0, "reduction": "mean"},
        "trans_occurrence": {"loss_weight": 0.0, "reduction": "mean"},
        "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
    }
    cfg["train"]["optimizer"] = {
        "name": "Adam",
        "joint_lrs": {"cnn_backbone": 1e-4, "add_on_layers": 3e-3,
                      "occurrence_module": 3e-3, "prototype_vectors": 3e-3},
        "warm_lrs": {"add_on_layers": 3e-3, "prototype_vectors": 3e-3},
        "last_layer_lr": 1e-4,
    }
    cfg["train"]["lr_schedule"] = {"name": "ReduceLROnPlateau", "mode": "max",
                                   "factor": 0.5, "patience": 2,
                                   "threshold": 1e-4, "cooldown": 0,
                                   "min_lr": 1e-6}
    agent = build_agent(cfg)
    agent.train()
    # staged checkpoint holds all 3 optimizer states and roundtrips
    st = agent.get_state()
    assert all(f"opt_state_{s}" in st for s in ("warm", "joint", "last"))
    import os
    cfg["model"]["checkpoint_path"] = os.path.join(agent.save_dir, "last.ckpt")
    agent2 = build_agent(cfg)
    assert agent2.current_epoch == agent.current_epoch
    accu, f1, auc = agent2.evaluate(mode="test")
    assert 0 <= f1 <= 1


def test_staged_agent_checkpoint_with_accumulation(synthetic_csv, tmp_path):
    """Regression: all three stages of the staged agents used to SHARE one
    GradAccumulator pytree; with accumulation_steps > 1 (the shipped
    baseline_protopnet.yml uses 5) the donated warm train step deleted the
    shared arrays out from under the joint/last entries and the first
    save_checkpoint crashed with 'Array has been deleted'. The other agent
    tests all run accumulation_steps=1, where the accumulator is never
    aliased into the step outputs — which is why they missed it."""
    cfg = _image_base(synthetic_csv, tmp_path / "accum")
    cfg.update({
        "agent": "ProtoPNet_Base",
        "abstain_class": False,
        "model": {
            "checkpoint_path": "",
            "name": "ProtoPNet",
            "base_architecture": "resnet18",
            "prototype_shape": "(6, 64, 1, 1)",
            "num_classes": 3,
            "prototype_activation_function": "log",
            "add_on_layers_type": "regular",
        },
    })
    cfg["train"]["criterion"] = {
        "CeLoss": {"loss_weight": 1, "reduction": "mean"},
        "ClusterPatch": {"loss_weight": 0.8, "reduction": "mean"},
        "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
    }
    cfg["train"]["optimizer"] = {
        "name": "Adam",
        "joint_lrs": {"features": 1e-4, "add_on_layers": 3e-3,
                      "prototype_vectors": 3e-3},
        "warm_lrs": {"add_on_layers": 3e-3, "prototype_vectors": 3e-3},
        "last_layer_lr": 1e-4,
    }
    cfg["train"]["accumulation_steps"] = 2
    cfg["train"]["num_warm_epochs"] = 1
    cfg["train"]["num_train_epochs"] = 1
    cfg["train"]["push_start"] = 1 << 30  # warm epoch + checkpoint only
    agent = build_agent(cfg)
    agent.train()  # ends with save_checkpoint — crashed before the fix
    assert os.path.exists(os.path.join(agent.save_dir, "last.ckpt"))
    # and the checkpoint must round-trip (deserializes all three accs)
    agent.load_checkpoint_file(os.path.join(agent.save_dir, "last.ckpt"))
