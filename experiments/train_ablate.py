#!/usr/bin/env python
"""Ablate the flagship train step to locate time sinks on the real chip.

Times (batch 8, bf16 unless --fp32): plain forward, eval step (fwd +
losses), train step with CE-only, train step without the TransformLoss
second forward, and the full 7-term train step. Chained two-point fits
(relay-safe, bench.py methodology).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.losses.bundle import LossBundle
from protoasnet_tpu.models.builder import build_model, init_model
from protoasnet_tpu.train.optim import GROUPS, make_adam
from protoasnet_tpu.train.steps import TrainState, make_xprotonet_steps

B = 8

CRIT_FULL = {
    "CeLossAbstain": {"loss_weight": 1, "ab_weight": 0.3,
                      "ab_logitpath": "joined", "reduction": "mean"},
    "ClusterRoiFeat": {"loss_weight": 0.8, "reduction": "mean"},
    "SeparationRoiFeat": {"loss_weight": 0.08, "reduction": "mean"},
    "OrthogonalityLoss": {"loss_weight": 0.01, "mode": "per_class"},
    "Lnorm_occurrence": {"p": 2, "loss_weight": 1e-4, "reduction": "mean"},
    "trans_occurrence": {"loss_weight": 0.001, "reduction": "mean"},
    "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
}


def two_point(run, k1=2, k2=8):
    run(1)  # compile
    t0 = time.time(); run(k1); ta = time.time() - t0
    t0 = time.time(); run(k2); tb = time.time() - t0
    return (tb - ta) / (k2 - k1) * 1000


def main():
    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (40, 256, 1, 1, 1),
           "num_classes": 4, "img_size": 112}
    if "--fp32" not in sys.argv:
        cfg["dtype"] = "bfloat16"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 32, 112, 112, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, size=B).astype(np.int32))
    valid = jnp.ones(B, bool)
    params, stats = init_model(model, x[:1], seed=0)
    variables = {"params": params, "batch_stats": stats}
    lrs = {g: jnp.float32(1e-4) for g in GROUPS}

    # plain forward
    @jax.jit
    def fwd_chain(v, xx, n):
        def body(i, xc):
            return xc + 1e-6 * model.apply(v, xc, train=False)[0].sum()
        return jax.lax.fori_loop(0, n, body, xx).sum()

    ms = two_point(lambda k: float(fwd_chain(variables, x, k)), 3, 12)
    print(f"forward(eval-BN)        {ms:7.1f} ms  ({B / ms * 1000:6.1f} clips/s)",
          flush=True)

    variants = [
        ("train CE-only", {"CeLossAbstain": CRIT_FULL["CeLossAbstain"]}),
        ("train no-trans", {k: v for k, v in CRIT_FULL.items()
                            if k != "trans_occurrence"}),
        ("train full", CRIT_FULL),
    ]
    for name, crit in variants:
        bundle = LossBundle(crit, num_classes=4, abstain_class=True)
        tx = make_adam(weight_decay_by_group={g: 1e-3 for g in GROUPS},
                       params=params)
        train_step, _, _ = make_xprotonet_steps(
            model, bundle, tx, accumulation_steps=1, stage="all",
            donate=False)
        state0 = TrainState.create(params, stats, tx)

        def run(k, ts=train_step, s0=state0):
            s, kk = s0, jax.random.PRNGKey(0)
            for _ in range(k):
                kk, sub = jax.random.split(kk)
                s, m = ts(s, x, y, valid, sub, lrs)
            float(m["loss_all"])

        ms = two_point(run)
        print(f"{name:22s}  {ms:7.1f} ms  ({B / ms * 1000:6.1f} clips/s)",
              flush=True)


if __name__ == "__main__":
    main()
