"""Push-scan batch-size and dtype A/B on the real chip.

Question: the push dataloader defaults to batch 32 (dataset.py push mode),
while serving found 128 to be the single-chip forward sweet spot. The push
scan is forward-only (push_forward + a cheap on-device argmin fold), so it
should track the serving curve — and the shipped flagship configs are
bf16, so the in-training push runs through the bf16 model, not the fp32
one bench.py's suite historically measured.

Method: the jitted push_forward (make_xprotonet_steps push_step) chained
inside one jitted fori_loop with a data dependence (dist feeds back into
x), two-point fit for the marginal per-batch time — the relay's fixed
per-call cost cancels (bench.py methodology). Sweeps batch {32, 64, 128}
x dtype {fp32, bf16}. A secondary leg runs the REAL push_prototypes carry
(fold_batch + final winner readback) over pre-staged batches at 32 vs 128
to confirm the fold does not erase the forward win.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -m experiments.push_batch_ab \
        [--legs fwd|staged|both]

Lesson from the first attempt (2026-08-19): n1=2/n2=6 gives a 4-batch
signal (~0.6 s) against the relay's ~0.5 s per-call jitter — negative
marginals. Use >=16-batch deltas (bench.py uses 30).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="both", choices=["fwd", "staged", "both"])
    cli = ap.parse_args()
    import jax
    import jax.numpy as jnp

    from protoasnet_tpu.losses.bundle import LossBundle
    from protoasnet_tpu.models.builder import build_model, init_model
    from protoasnet_tpu.train.optim import make_adam
    from protoasnet_tpu.train.steps import make_xprotonet_steps

    base = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
            "backbone_last_layer_num": -3,
            "prototype_shape": (40, 256, 1, 1, 1), "num_classes": 4,
            "img_size": 112}
    rng = np.random.default_rng(0)
    out = {}

    # bf16 is the shipped flagship dtype; fp32 only at b32 as the
    # historical sanity row (bench.py's pre-round-4 push numbers).
    sweep = {"fp32": (32,), "bf16": (32, 64, 128)}
    for dname, cfg in (() if cli.legs == "staged" else
                       (("fp32", base),
                        ("bf16", {**base, "dtype": "bfloat16"}))):
        model = build_model(cfg)
        params, stats = init_model(model, jnp.zeros((1, 32, 112, 112, 3)),
                                   seed=0)
        bundle = LossBundle({}, 4, True)
        tx = make_adam(params=params)
        _, _, push_step = make_xprotonet_steps(model, bundle, tx)
        del push_step  # we re-jit a chained variant below

        def chained(v_params, v_stats, x, n, _model=model):
            def body(i, xc):
                roi, dist, occ, logits = _model.apply(
                    {"params": v_params, "batch_stats": v_stats}, xc,
                    method=_model.push_forward)
                return xc + 1e-6 * dist.sum()
            return jax.lax.fori_loop(0, n, body, x).sum()

        # n must be TRACED (fori_loop takes a dynamic bound): a static n
        # recompiles per n-value and the two-point fit then measures
        # compile-time variance, not runtime (first attempts: negative
        # marginals). bench.py's chained() has the same shape.
        chained = jax.jit(chained)

        for b in sweep[dname]:
            x = jnp.asarray(rng.normal(
                size=(b, 32, 112, 112, 3)).astype(np.float32))
            try:
                float(chained(params, stats, x, 1))  # compile
            except Exception as e:  # OOM at this batch: record and move on
                out[f"push_fwd_{dname}_b{b}"] = f"FAILED: {type(e).__name__}"
                print(f"{dname} b{b}: {e}", flush=True)
                continue
            # >=16-batch delta so the signal dominates relay jitter
            n1, n2 = 4, 20
            t0 = time.time(); float(chained(params, stats, x, n1))
            ta = time.time() - t0
            t0 = time.time(); float(chained(params, stats, x, n2))
            tb = time.time() - t0
            per = (tb - ta) / (n2 - n1)
            cps = b / per
            out[f"push_fwd_{dname}_b{b}_clips_per_sec"] = round(cps, 1)
            print(f"push_forward {dname} b{b}: {cps:7.1f} clips/s "
                  f"({per * 1000:.1f} ms/batch)", flush=True)

    if cli.legs == "fwd":
        print(json.dumps(out))
        return

    # --- secondary: REAL push_prototypes (fold carry + winner readback)
    # over pre-staged device batches, bf16, batch 32 vs 128. Two dataset
    # sizes cancel the per-push fixed costs (carry init, final sync).
    from protoasnet_tpu.push.push import push_prototypes

    model = build_model({**base, "dtype": "bfloat16"})
    params, stats = init_model(model, jnp.zeros((1, 32, 112, 112, 3)),
                               seed=0)
    bundle = LossBundle({}, 4, True)
    tx = make_adam(params=params)
    _, _, push_step = make_xprotonet_steps(model, bundle, tx)
    cid = model.class_identity()

    def staged_batches(n_clips, b):
        n_batches = n_clips // b
        out_b = []
        for i in range(n_batches):
            cine = jnp.asarray(rng.normal(
                size=(b, 32, 112, 112, 3)).astype(np.float32))
            jax.block_until_ready(cine)
            out_b.append({
                "cine": cine,
                "target_AS": np.asarray(
                    rng.integers(0, 3, size=b), np.int32),
                "valid": np.ones(b, bool),
                "filename": [f"v{i}_{j}" for j in range(b)],
                "video_idx": np.arange(b, dtype=np.int64),
                "window_start": np.zeros(b, np.int64),
                "window_end": np.full(b, 32, np.int64),
            })
        return out_b

    def run(batches):
        t0 = time.time()
        push_prototypes(batches, push_step, params, stats,
                        class_identity=cid, abstain_class=True,
                        render=False,
                        root_dir_for_saving_prototypes=None,
                        replace_prototypes=True)
        return time.time() - t0

    for b in (32, 128):
        small = staged_batches(128, b)
        big = staged_batches(384, b)
        run(small)  # warm
        dt_s, dt_b = run(small), run(big)
        marginal = (384 - 128) / (dt_b - dt_s) if dt_b > dt_s else float("nan")
        out[f"push_e2e_staged_bf16_b{b}_marginal_clips_per_sec"] = (
            round(marginal, 1))
        print(f"push_prototypes staged bf16 b{b}: small {128/dt_s:.1f} "
              f"clips/s, marginal {marginal:.1f} clips/s", flush=True)
        del small, big

    print(json.dumps(out))


if __name__ == "__main__":
    main()
