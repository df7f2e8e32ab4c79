"""The hermetic deploy.sh: drive the ACTUAL `python main.py` train CLI as a
subprocess on the synthetic fixture, then `--eval_only` against the run it
produced. This is the reference's de-facto integration test
(/root/reference/main.py:18-59 + deploy.sh) made self-contained: dotted
overrides, run-dir resolution, config dump, logger, seed, code backup,
train->push->eval, checkpoint family, and resume-style eval all cross the
same process boundary a user's shell does."""

import os
import subprocess
import sys

import pandas as pd
import pytest
import yaml

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # match conftest: small host, keep the persistent compile cache warm
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = REPO
    return env


@pytest.fixture(scope="module")
def cli_config(synthetic_csv, tmp_path_factory):
    """A tiny but complete image-flagship config written to disk, as a
    user would author it (main.py requires --config_path)."""
    tmp = tmp_path_factory.mktemp("cli")
    cfg = {
        "agent": "XProtoNet_e2e",
        "abstain_class": True,
        "wandb_mode": "disabled",
        "run_name": "cli_run",
        "save_dir": str(tmp / "logs"),
        "render_prototypes": False,
        "model": {"checkpoint_path": "", "name": "XProtoNet",
                  "base_architecture": "resnet18",
                  "prototype_shape": "(8, 64, 1, 1)", "num_classes": 4},
        "train": {
            "seed": 2, "num_train_epochs": 1, "save": True,
            "save_step": None, "num_warm_epochs": 0, "batch_size": 4,
            "accumulation_steps": 1, "push_start": 0, "push_rate": 1,
            "criterion": {
                "CeLossAbstain": {"loss_weight": 1, "ab_weight": 0.7,
                                  "ab_logitpath": "joined",
                                  "reduction": "mean"},
                "ClusterRoiFeat": {"loss_weight": 0.8, "reduction": "mean"},
                "SeparationRoiFeat": {"loss_weight": 0.08,
                                      "reduction": "mean"},
                "OrthogonalityLoss": {"loss_weight": 0.01,
                                      "mode": "per_class"},
                "Lnorm_occurrence": {"p": 2, "loss_weight": 0.0,
                                     "reduction": "mean"},
                "trans_occurrence": {"loss_weight": 0.001,
                                     "reduction": "mean"},
                "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
            },
            "optimizer": {"name": "Adam", "mode": "lr_same",
                          "lr_same": 1e-4},
            "lr_schedule": {"name": "ReduceLROnPlateau", "mode": "max",
                            "factor": 0.5, "patience": 2, "threshold": 1e-4,
                            "cooldown": 0, "min_lr": 1e-6},
        },
        "data": {
            "data_info_file": "OVERRIDDEN_ON_THE_COMMAND_LINE",
            "sample_size": None, "sampler": "AS", "view": "all",
            "augmentation": True, "transform_rotate_degrees": 10,
            "transform_min_crop_ratio": 0.7, "transform_time_dilation": 0.2,
            "normalize": True, "img_size": 32, "frames": 1,
            "iterate_intervals": True, "interval_unit": "image",
            "interval_quant": 1.0, "eval_batch_size": 8,
        },
    }
    path = tmp / "cli.yml"
    path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    return str(path), str(tmp / "logs"), synthetic_csv


def _run_cli(args, timeout=1800):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"), *args],
        env=_cli_env(), cwd=REPO, capture_output=True, text=True,
        timeout=timeout)


def test_main_cli_train_then_eval_only(cli_config):
    cfg_path, logs, csv = cli_config

    r = _run_cli([f"--config_path={cfg_path}",
                  f"--data.data_info_file={csv}",
                  "--train.num_train_epochs=1"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    run_dir = os.path.join(logs, "cli_run")
    assert os.path.isdir(run_dir), os.listdir(logs)
    # the artifacts the reference convention promises (SURVEY.md §2.1):
    assert os.path.exists(os.path.join(run_dir, "config_train.yml"))
    assert os.path.exists(os.path.join(run_dir, "last.ckpt"))
    assert os.path.isdir(os.path.join(run_dir, "code"))  # backup_code
    # dotted override actually reached the dumped config
    with open(os.path.join(run_dir, "config_train.yml")) as f:
        dumped = yaml.safe_load(f)
    assert dumped["data"]["data_info_file"] == csv
    # train() pushed at epoch 0 and evaluated on val -> per-sample CSV
    csv_dirs = [d for d in os.listdir(run_dir) if d.startswith("csv_")]
    assert csv_dirs, os.listdir(run_dir)

    # eval_only against the SAME run dir: create_save_loc must reuse a
    # dir that contains a checkpoint (resume semantics), and the agent
    # must load last.ckpt via auto-resume, not train
    r2 = _run_cli([f"--config_path={cfg_path}",
                   f"--data.data_info_file={csv}",
                   "--eval_only=true", "--eval_data_type=test"])
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert os.path.exists(os.path.join(run_dir, "config_eval_test.yml"))
    assert os.path.isdir(os.path.join(run_dir, "csv_test"))
    assert os.listdir(os.path.join(run_dir, "csv_test"))
    # --eval_only also emits the paper's headline quantity: the per-video
    # reduction (mean prob over intervals) next to the interval CSV
    video_csvs = [f for f in os.listdir(os.path.join(run_dir, "csv_test"))
                  if f.endswith("video_level.csv")]
    assert video_csvs, os.listdir(os.path.join(run_dir, "csv_test"))
    vdf = pd.read_csv(os.path.join(run_dir, "csv_test", video_csvs[0]))
    for col in ("filename", "target_AS", "n_intervals", "pred_AS"):
        assert col in vdf.columns, vdf.columns
    assert (vdf["n_intervals"] >= 1).all()
    # one row per unique video
    assert vdf["filename"].is_unique

    # explain CLI over the same run (reference explain.py:17-52): loads
    # the checkpoint, reads the push's prototype evidence, renders panels
    r3 = subprocess.run(
        [sys.executable, os.path.join(REPO, "explain.py"),
         f"--config_path={cfg_path}", f"--data.data_info_file={csv}",
         "--explain_locally=true", "--eval_data_type=test"],
        env=_cli_env(), cwd=REPO, capture_output=True, text=True,
        timeout=1800)
    assert r3.returncode == 0, r3.stdout[-2000:] + r3.stderr[-2000:]
    assert os.path.exists(os.path.join(run_dir, "config_explain_test.yml"))
    exp_dir = os.path.join(run_dir, "explain_test")
    assert os.path.isdir(exp_dir) and os.listdir(exp_dir), \
        "explain CLI produced no artifacts"
