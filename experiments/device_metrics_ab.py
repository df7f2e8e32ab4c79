#!/usr/bin/env python
"""On-device epoch metrics A/B (VERDICT r4 item 6).

Isolates exactly what the ``train.on_device_metrics`` flag changes in an
eval epoch at the shipped eval_batch_size=128: per batch, the HOST path
reads logits/sims/target back and appends numpy rows (a device->host sync
every step — through this host's relay, a fixed ~0.3-0.5 s round trip);
the DEVICE path scatters them into preallocated device buffers (pure
device work, async-dispatchable) and reads everything back ONCE at epoch
end. Inputs are device-resident so the A/B measures metric handling, not
the loader.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/device_metrics_ab.py

MEASURED RESULTS (v5e-1, 2026-08-20, 8 batches of 128, best of 3
interleaved reps): host path 2.09 s/epoch (489 clips/s), device path
1.46 s (701 clips/s) — **1.43x**; the per-batch host sync costs ~79 ms
per step on this link. Shipped: train.on_device_metrics now defaults
ON (train/agents/xprotonet.py); val_push/test keep the host path for
per-sample CSV metadata.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

B = 128
N_BATCHES = 8


def main():
    import jax
    import jax.numpy as jnp

    from protoasnet_tpu.losses.bundle import LossBundle
    from protoasnet_tpu.models.builder import build_model, init_model
    from protoasnet_tpu.train.device_metrics import DeviceEpochBuffer
    from protoasnet_tpu.train.optim import GROUPS, make_adam
    from protoasnet_tpu.train.steps import TrainState, make_xprotonet_steps
    from protoasnet_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (40, 256, 1, 1, 1),
           "num_classes": 4, "img_size": 112, "dtype": "bfloat16"}
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    params, stats = init_model(model, jnp.zeros((1, 32, 112, 112, 3)), seed=0)
    crit = {"CeLossAbstain": {"loss_weight": 1, "ab_weight": 0.3,
                              "ab_logitpath": "joined", "reduction": "mean"},
            "ClusterRoiFeat": {"loss_weight": 0.8, "reduction": "mean"},
            "SeparationRoiFeat": {"loss_weight": 0.08, "reduction": "mean"}}
    bundle = LossBundle(crit, num_classes=4, abstain_class=True)
    tx = make_adam(weight_decay_by_group={g: 1e-3 for g in GROUPS},
                   params=params)
    _, eval_step, _ = make_xprotonet_steps(model, bundle, tx, stage="all",
                                           donate=False)

    x = jnp.asarray(rng.normal(size=(B, 32, 112, 112, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, size=B).astype(np.int32))
    valid = jnp.ones(B, jnp.bool_)
    key = jax.random.PRNGKey(0)

    # warm both programs
    m = eval_step(params, stats, x, y, valid, key)
    float(m["loss_all"])

    def host_epoch():
        """Per-batch readback + EpochMetrics.update, what run_epoch's host
        path does every step."""
        from protoasnet_tpu.train.metrics import EpochMetrics

        em = EpochMetrics(num_classes=4, abstain_class=True,
                          num_prototypes=40)
        t0 = time.time()
        for i in range(N_BATCHES):
            m = eval_step(params, stats, x, y, valid, key)
            em.update(np.asarray(m["logits"]), np.asarray(y),
                      np.asarray(valid),
                      similarities=np.asarray(m["similarities"]),
                      loss_terms={"loss_all": float(m["loss_all"])})
        return time.time() - t0, em

    def device_epoch():
        from protoasnet_tpu.train.metrics import EpochMetrics

        em = EpochMetrics(num_classes=4, abstain_class=True,
                          num_prototypes=40)
        buf = DeviceEpochBuffer(n_batches=N_BATCHES, batch_size=B,
                                num_logits=4, num_prototypes=40,
                                loss_names=["loss_all"])
        t0 = time.time()
        for i in range(N_BATCHES):
            m = eval_step(params, stats, x, y, valid, key)
            buf.update(m, y, valid)
        out = buf.finalize(em)
        return time.time() - t0, out

    out = {}
    # interleave (relay rate drifts minute to minute): host, device, x3
    host_ts, dev_ts = [], []
    for rep in range(3):
        th, _ = host_epoch()
        td, _ = device_epoch()
        host_ts.append(th)
        dev_ts.append(td)
        print(f"rep {rep}: host {th:.2f}s  device {td:.2f}s", flush=True)
    out["host_epoch_s"] = round(min(host_ts), 3)
    out["device_epoch_s"] = round(min(dev_ts), 3)
    out["speedup"] = round(min(host_ts) / min(dev_ts), 3)
    out["clips_per_s_host"] = round(B * N_BATCHES / min(host_ts), 1)
    out["clips_per_s_device"] = round(B * N_BATCHES / min(dev_ts), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
