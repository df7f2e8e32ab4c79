"""Eval-epoch batch-size A/B on the real chip.

Question: how much do val/test epochs gain from `data.eval_batch_size`
(dataset.py video-eval override) — i.e. running the forward+loss eval step
at a serving-sized batch instead of the fwd+bwd-memory train batch?

Method: the exact eval computation from make_xprotonet_steps._eval_step
(combined pair forward incl. TransformLoss + the flagship 7-term loss,
train=False) chained inside one jitted fori_loop with a data dependence,
two-point fit for the marginal per-batch time (bench.py methodology — the
relay's fixed per-call cost cancels).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -m experiments.eval_batch_ab
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from protoasnet_tpu.losses.bundle import LossBundle
    from protoasnet_tpu.models.builder import build_model, init_model
    from protoasnet_tpu.train.steps import _pair_forward

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3,
           "prototype_shape": (40, 256, 1, 1, 1), "num_classes": 4,
           "img_size": 112, "dtype": "bfloat16"}
    model = build_model(cfg)
    params, stats = init_model(model, jnp.zeros((1, 32, 112, 112, 3)),
                               seed=0)
    criterion = {
        "CeLossAbstain": {"loss_weight": 1, "ab_weight": 0.3,
                          "ab_logitpath": "joined", "reduction": "mean"},
        "ClusterRoiFeat": {"loss_weight": 0.8, "reduction": "mean"},
        "SeparationRoiFeat": {"loss_weight": 0.08, "reduction": "mean"},
        "OrthogonalityLoss": {"loss_weight": 0.0, "mode": "per_class"},
        "Lnorm_occurrence": {"p": 2, "loss_weight": 0.0, "reduction": "mean"},
        "trans_occurrence": {"loss_weight": 0.001, "reduction": "mean"},
        "Lnorm_FC": {"p": 1, "loss_weight": 1e-4},
    }
    bundle = LossBundle(criterion, num_classes=4, abstain_class=True)
    class_identity = model.class_identity()
    rng = np.random.default_rng(0)

    results = {}
    for b in (5, 8, 16, 32, 64):
        x = jnp.asarray(rng.normal(size=(b, 32, 112, 112, 3)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 3, size=b), jnp.int32)
        valid = jnp.ones(b, jnp.bool_)

        @jax.jit
        def chained(params, stats, x, n):
            def body(i, xc):
                logits, sim, occ, occ_t, aff, _ = _pair_forward(
                    model, params, stats, xc, jax.random.PRNGKey(0),
                    train=False)
                total, _ = bundle.xprotonet_terms(
                    logits, sim, occ, y, occ_transformed=occ_t,
                    affine_params=aff, valid=valid,
                    prototype_vectors=params["prototype_vectors"],
                    fc_kernel=params["last_layer"]["Dense_0"]["kernel"],
                    class_identity=class_identity)
                return xc + 1e-6 * total
            return jax.lax.fori_loop(0, n, body, x).sum()

        t0 = time.time()
        float(chained(params, stats, x, 1))
        compile_s = time.time() - t0

        def run(n):
            t0 = time.time()
            float(chained(params, stats, x, n))
            return time.time() - t0

        n1, n2 = 3, 10
        t1, t2 = run(n1), run(n2)
        per = (t2 - t1) / (n2 - n1)
        results[b] = round(b / per, 1)
        print(f"batch {b}: {b / per:.1f} clips/s eval "
              f"({per * 1e3:.1f} ms/batch marginal, compile {compile_s:.0f}s)",
              flush=True)

    base = results[5]
    print(json.dumps({"eval_clips_per_sec_by_batch": results,
                      "speedup_vs_train_batch5":
                          {k: round(v / base, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
