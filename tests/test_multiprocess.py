"""Real 2-process DCN-path test (VERDICT round-2 item 3).

`global_batch_from_local`'s `process_count > 1` branch and the
`maybe_initialize_distributed` bring-up were previously exercised only by
env-var unit tests. Here two ACTUAL processes (4 virtual CPU devices
each) initialize against a localhost coordinator, span one 8-device
mesh, feed per-process local batch halves, and run two chained train
steps — the loss must match the single-process 8-device run of the same
global batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CRITERION = {
    "CeLossAbstain": {"loss_weight": 1, "ab_weight": 0.3,
                      "ab_logitpath": "joined", "reduction": "mean"},
    "ClusterRoiFeat": {"loss_weight": 0.8, "reduction": "mean"},
    "SeparationRoiFeat": {"loss_weight": 0.08, "reduction": "mean"},
    "Lnorm_occurrence": {"p": 2, "loss_weight": 1e-4, "reduction": "mean"},
    "trans_occurrence": {"loss_weight": 0.001, "reduction": "mean"},
    "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
}


def tiny_model_cfg():
    return {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
            "backbone_last_layer_num": -3,
            "prototype_shape": (8, 64, 1, 1, 1), "num_classes": 4,
            "img_size": 32}


def global_batch():
    """Deterministic 8-sample global batch shared by every process."""
    rng = np.random.default_rng(17)
    x = rng.normal(size=(8, 8, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 3, size=8).astype(np.int32)
    v = np.ones(8, bool)
    return x, y, v


def padded_global_batch():
    """An epoch's UNEVEN final batch: 6 real samples padded to 8 by
    repeating the last row (exactly what data/dataset.py:335-337 does),
    with valid=False masking the padding."""
    rng = np.random.default_rng(23)
    x = rng.normal(size=(8, 8, 32, 32, 3)).astype(np.float32)
    x[6:] = x[5]  # pad rows repeat the last real sample
    y = rng.integers(0, 3, size=8).astype(np.int32)
    y[6:] = y[5]
    v = np.array([True] * 6 + [False] * 2)
    return x, y, v


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_loss():
    """The same two chained steps on this process's own 8-device mesh."""
    import jax
    import jax.numpy as jnp

    from protoasnet_tpu.losses.bundle import LossBundle
    from protoasnet_tpu.models.builder import build_model, init_model
    from protoasnet_tpu.parallel import make_mesh, replicate, shard_batch
    from protoasnet_tpu.train.optim import GROUPS, make_adam
    from protoasnet_tpu.train.steps import TrainState, make_xprotonet_steps

    model = build_model(tiny_model_cfg())
    x, y, v = global_batch()
    params, batch_stats = init_model(model, jnp.asarray(x[:1]), seed=0)
    bundle = LossBundle(CRITERION, num_classes=4, abstain_class=True)
    tx = make_adam(weight_decay_by_group={g: 1e-3 for g in GROUPS},
                   params=params)
    step, _, _ = make_xprotonet_steps(model, bundle, tx,
                                      accumulation_steps=1, stage="all",
                                      donate=False)
    mesh = make_mesh()
    state = replicate(mesh, TrainState.create(params, batch_stats, tx))
    gb = shard_batch(mesh, {"cine": jnp.asarray(x),
                            "target_AS": jnp.asarray(y),
                            "valid": jnp.asarray(v)})
    lrs = {g: jnp.float32(1e-4) for g in GROUPS}
    st, m = step(state, gb["cine"], gb["target_AS"], gb["valid"],
                 jax.random.PRNGKey(0), lrs)
    _, m2 = step(st, gb["cine"], gb["target_AS"], gb["valid"],
                 jax.random.PRNGKey(1), lrs)
    # the padded final batch (same jitted program; valid is an input)
    xp, yp, vp = padded_global_batch()
    gbp = shard_batch(mesh, {"cine": jnp.asarray(xp),
                             "target_AS": jnp.asarray(yp),
                             "valid": jnp.asarray(vp)})
    _, mp = step(state, gbp["cine"], gbp["target_AS"], gbp["valid"],
                 jax.random.PRNGKey(0), lrs)
    return float(m["loss_all"]), float(m2["loss_all"]), float(mp["loss_all"])


def test_two_process_train_step_matches_single_process():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_COORDINATOR_ADDRESS",
                             "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")}
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "tests", "multiproc_driver.py"),
             str(pid), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env_base,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses, pads, fsdps = [], [], []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSS ")][-1]
        losses.append(tuple(float(t) for t in line.split()[1:]))
        pads.append(float([ln for ln in out.splitlines()
                           if ln.startswith("PADLOSS ")][-1].split()[1]))
        fsdps.append(float([ln for ln in out.splitlines()
                            if ln.startswith("FSDPLOSS ")][-1].split()[1]))
    # both processes observe the identical (replicated) global loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    np.testing.assert_allclose(pads[0], pads[1], rtol=1e-6)
    np.testing.assert_allclose(fsdps[0], fsdps[1], rtol=1e-6)

    ref = _single_process_loss()
    # step-1 loss (before any update): same global batch, so any wiring bug
    # (wrong shard assembly, double-counting) would show here — keep tight.
    np.testing.assert_allclose(losses[0][0], ref[0], rtol=2e-5)
    # step-2 loss (after one Adam update): the cross-process collective
    # (gloo) and the in-program 8-device psum reduce in different orders,
    # and Adam's first step is g/sqrt(g^2*(1-b2)) — near-sign(g) — which
    # amplifies that last-ulp grad noise; observed up to ~1.2e-4 relative
    # on some hosts (codegen-dependent). Anything structural would be
    # orders of magnitude larger.
    np.testing.assert_allclose(losses[0][1], ref[1], rtol=1e-3)
    # uneven final batch: the 2 masked pad rows must not contribute — the
    # 2-process padded loss matches the single-process run of the same
    # padded batch, and it is a genuinely different number than the full
    # batch's (guards against valid being ignored entirely).
    np.testing.assert_allclose(pads[0], ref[2], rtol=2e-5)
    assert abs(pads[0] - losses[0][0]) > 1e-6
    # FSDP placement must not change the math: step-1 forward runs on
    # all-gathered params that are bitwise the DP ones.
    np.testing.assert_allclose(fsdps[0], losses[0][0], rtol=2e-5)
