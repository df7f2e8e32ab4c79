#!/usr/bin/env python
"""Train-step bwd ceiling study (VERDICT r4 item 4).

fwd alone measures 50.9% bf16 MFU; the full train step 35.3%. This runs
the A/B matrix the judge asked for — remat on/off, buffer donation
on/off, batch 4/8/16 (grad-accum at 16 where plain 16 OOMs), plus a
grad-only step (no optimizer update) to split bwd cost from the Adam
update — each with its own analytic-MFU number so the gap decomposes.

Chained two-point fits (relay-safe, bench.py methodology); each variant
times the REAL jitted train step over the flagship Video_XProtoNet
(resnet2p1d_18 trunc -3, 32x112x112, 7-term loss incl. the combined
TransformLoss forward).

Usage: python experiments/train_bwd_ceiling.py [--quick|--fwd-only]

MEASURED RESULTS (v5e-1, 2026-08-20) — CONCLUSION: structural ceiling;
the "gap" was a batch-size artifact, not a bwd inefficiency.

  b8  remat0 donate0    118.0 ms   67.8 clips/s  MFU 34.7%   (shipped)
  b8  remat0 donate1    118.2 ms   67.7 clips/s  MFU 34.6%   (donation: 0%)
  b8  remat1 donate1    153.4 ms   52.2 clips/s  MFU 34.8%   (remat: -23%)
  b4  remat0 donate1     60.6 ms   66.1 clips/s  MFU 33.8%
  b16 remat0 donate1    243.3 ms   65.8 clips/s  MFU 33.7%   (fits, but -3%)
  b16 remat1 donate1    340.0 ms   47.1 clips/s  MFU 31.4%
  b8  grad-only         117.8 ms   67.9 clips/s  MFU 34.7%   (Adam+accum
                                                              update: FREE)
  b8  fwd-only           17.1 ms  469.2 clips/s  MFU 37.3%

  Reading: the r4 framing "fwd 50.9% vs train 35.3%" compared a
  batch-128 inference number against a batch-8 train number. At the SAME
  batch 8, the forward alone runs at 37.3% MFU — the full train step's
  34.7% means fwd+bwd+update together lose only ~3 MFU points to the
  forward; the backward pass lowers essentially as well as the forward,
  and the optimizer update measures zero marginal cost. The real ceiling
  is batch size: fwd+bwd activation memory caps the step at b8-b16
  (b16 measured -3%, b32 OOM per the r2 sweep), where the 56x56 convs
  can't tile the MXU as well as at serving batch 128. No knob in the
  matrix (donation, remat, batch, accumulation) moves it; remat costs
  -23% and buys nothing here since b16 fits without it and is slower.
  Train defaults stand: batch 8, remat off, donate on.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.losses.bundle import LossBundle
from protoasnet_tpu.models.builder import build_model, init_model
from protoasnet_tpu.train.optim import GROUPS, make_adam
from protoasnet_tpu.train.steps import (TrainState, make_xprotonet_loss_fn,
                                        make_xprotonet_steps)
from protoasnet_tpu.utils.flops import count_flops, mfu

QUICK = "--quick" in sys.argv

CRIT = {
    "CeLossAbstain": {"loss_weight": 1, "ab_weight": 0.3,
                      "ab_logitpath": "joined", "reduction": "mean"},
    "ClusterRoiFeat": {"loss_weight": 0.8, "reduction": "mean"},
    "SeparationRoiFeat": {"loss_weight": 0.08, "reduction": "mean"},
    "OrthogonalityLoss": {"loss_weight": 0.01, "mode": "per_class"},
    "Lnorm_occurrence": {"p": 2, "loss_weight": 1e-4, "reduction": "mean"},
    "trans_occurrence": {"loss_weight": 0.001, "reduction": "mean"},
    "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
}

CFG = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
       "backbone_last_layer_num": -3, "prototype_shape": (40, 256, 1, 1, 1),
       "num_classes": 4, "img_size": 112, "dtype": "bfloat16"}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fresh_state(state0):
    """Deep-copy so a donate=True step can consume it."""
    return jax.tree_util.tree_map(lambda x: jnp.array(x), state0)


def time_step(step, state0, x, y, valid, lrs, donate):
    def run(k):
        s = fresh_state(state0) if donate else state0
        kk = jax.random.PRNGKey(0)
        jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
        t0 = time.time()
        for _ in range(k):
            kk, sub = jax.random.split(kk)
            s, m = step(s, x, y, valid, sub, lrs)
        float(m["loss_all"])
        return time.time() - t0

    t0 = time.time()
    run(1)
    compile_s = time.time() - t0
    k1, k2 = (2, 6) if QUICK else (2, 10)
    t1, t2 = run(k1), run(k2)
    return (t2 - t1) / (k2 - k1), compile_s


def main():
    from protoasnet_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    base_model = build_model(CFG)
    x8 = jnp.asarray(rng.normal(size=(8, 32, 112, 112, 3)).astype(np.float32))
    params, stats = init_model(base_model, x8[:1], seed=0)
    lrs = {g: jnp.float32(1e-4) for g in GROUPS}
    bundle = LossBundle(CRIT, num_classes=4, abstain_class=True)

    # (label, batch, remat, donate, accum)
    matrix = [] if "--fwd-only" in sys.argv else [
        ("b8  remat0 donate0", 8, False, False, 1),
        ("b8  remat0 donate1", 8, False, True, 1),
        ("b8  remat1 donate1", 8, True, True, 1),
        ("b4  remat0 donate1", 4, False, True, 1),
        ("b16 remat0 donate1", 16, False, True, 1),
        ("b16 remat1 donate1", 16, True, True, 1),
    ]
    results = {}
    for label, b, remat, donate, accum in matrix:
        model = build_model({**CFG, "remat": True}) if remat else base_model
        tx = make_adam(weight_decay_by_group={g: 1e-3 for g in GROUPS},
                       params=params)
        step, _, _ = make_xprotonet_steps(model, bundle, tx,
                                          accumulation_steps=accum,
                                          stage="all", donate=donate)
        if b <= 8:
            x = x8[:b]
        else:
            x = jnp.asarray(
                rng.normal(size=(b, 32, 112, 112, 3)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, 3, size=b).astype(np.int32))
        valid = jnp.ones(b, jnp.bool_)
        state0 = TrainState.create(params, stats, tx)
        try:
            per_step, compile_s = time_step(step, state0, x, y, valid, lrs,
                                            donate)
        except Exception as e:  # noqa: BLE001 — OOM is a result here
            print(f"{label:22s}  FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
            continue
        cps = b / per_step
        fl = count_flops(step, state0, x, y, valid, jax.random.PRNGKey(0),
                         lrs) / b
        m = mfu(fl, cps, "bf16")
        results[label] = (cps, m)
        print(f"{label:22s}  {per_step * 1000:7.1f} ms  {cps:6.1f} clips/s  "
              f"MFU {m * 100:4.1f}%  (compile {compile_s:.0f}s)", flush=True)

    # ---- grad-only (no optimizer update): splits bwd from Adam/accum ----
    if "--fwd-only" in sys.argv:
        _fwd_leg(base_model, params, stats, x8)
        return
    class_identity = jnp.asarray(base_model.class_identity())
    loss_fn = make_xprotonet_loss_fn(base_model, bundle, class_identity,
                                     combined=True)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    y8 = jnp.asarray(rng.integers(0, 3, size=8).astype(np.int32))
    v8 = jnp.ones(8, jnp.bool_)

    def run_grad(k):
        kk, acc = jax.random.PRNGKey(0), x8
        t0 = time.time()
        tot = jnp.float32(0)
        for _ in range(k):
            kk, sub = jax.random.split(kk)
            (val, aux), grads = grad_fn(params, stats, acc, y8, v8, sub)
            tot = tot + val
        float(tot)
        return time.time() - t0

    run_grad(1)
    k1, k2 = (2, 6) if QUICK else (2, 10)
    t1, t2 = run_grad(k1), run_grad(k2)
    per = (t2 - t1) / (k2 - k1)
    fl = count_flops(grad_fn, params, stats, x8, y8, v8,
                     jax.random.PRNGKey(0)) / 8
    print(f"{'b8  grad-only':22s}  {per * 1000:7.1f} ms  {8 / per:6.1f} "
          f"clips/s  MFU {mfu(fl, 8 / per, 'bf16') * 100:4.1f}%", flush=True)

    # ---- fwd-only reference at the same batch ----
    _fwd_leg(base_model, params, stats, x8)


def _fwd_leg(base_model, params, stats, x8):
    import jax

    @jax.jit
    def fwd_chain(v, xx, n):
        def body(i, xc):
            return xc + 1e-6 * base_model.apply(v, xc, train=False)[0].sum()
        return jax.lax.fori_loop(0, n, body, xx).sum()

    variables = {"params": params, "batch_stats": stats}

    def run_fwd(k):
        t0 = time.time()
        float(fwd_chain(variables, x8, k))
        return time.time() - t0

    run_fwd(1)
    t1, t2 = run_fwd(3), run_fwd(12)
    per = (t2 - t1) / 9
    fl = count_flops(lambda v, xx: base_model.apply(v, xx, train=False),
                     variables, x8) / 8
    print(f"{'b8  fwd-only':22s}  {per * 1000:7.1f} ms  {8 / per:6.1f} "
          f"clips/s  MFU {mfu(fl, 8 / per, 'bf16') * 100:4.1f}%", flush=True)


if __name__ == "__main__":
    main()
