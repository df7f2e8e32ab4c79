"""Const-weights ceiling probes beyond the first A/B.

Two follow-ups to `const_weights_ab.py` (+29% bf16 / +5.4% int8 at video
batch 128):

1. **int8 video at batch 256** — bf16 const peaks at batch 256 (860.6
   clips/s, serving_batch_sweep.py --const); int8's smaller temps may
   fit 256 too and lift the int8 serving ceiling past 991.
2. **Image flagship const A/B** — the image model serves at 36.6k
   imgs/s (69% MFU) on the args path; does const-weight layout
   prepacking move a model that is already near peak?

Inputs are generated ON DEVICE (no relay staging), two-point chained
fits as everywhere else.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
       experiments/const_ceiling_probe.py

MEASURED RESULTS (v5e-1, 2026-08-19) — both probes NEGATIVE:

  video_int8_const_b128:    990.5 clips/s
  video_int8_const_b256:    991.7 clips/s   (+0.1% — int8 is already at
                                             its ceiling at batch 128;
                                             unlike bf16, which gains
                                             +4.5% at 256)
  image_args_b128:        36,572.7 imgs/s
  image_const_b128:       34,843.8 imgs/s   (-4.7% — const weights HURT
                                             the image flagship; at 69%
                                             MFU there is no layout-
                                             prepacking headroom left,
                                             and the baked literals
                                             evidently cost scheduling
                                             freedom)

Reading: the const-weights win is specific to the (2+1)D video conv
stack at bf16. Serving defaults stay as shipped — video bundles gain
+29% bf16 / +5.4% int8; image bundles lose ~5%, which is not worth a
per-model code path (image serving is 36k imgs/s either way, far above
any realistic clinic load). Batch 128 remains the universal serving
default.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _measure(name, call, b, out, n1=3, n2=13):
    try:
        t0 = time.time()
        float(call(1))
        compile_s = time.time() - t0
    except Exception as e:  # noqa: BLE001 — OOM candidates are data
        out[name] = f"FAILED: {type(e).__name__}"
        print(f"{name}: FAILED {type(e).__name__}", flush=True)
        return
    t0 = time.time(); float(call(n1)); ta = time.time() - t0
    t0 = time.time(); float(call(n2)); tb = time.time() - t0
    per = (tb - ta) / (n2 - n1)
    out[name] = round(b / per, 1)
    print(f"{name}: {b / per:8.1f} samples/s ({per * 1000:.1f} ms/batch, "
          f"compile {compile_s:.0f}s)", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from protoasnet_tpu.models.builder import build_model, init_model
    from protoasnet_tpu.quant import (apply_quantized, build_qstate,
                                      calibrate_act_scales)
    from protoasnet_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    out = {}
    rng = np.random.default_rng(0)

    # --- 1. int8 video const at 128 / 256 --------------------------------
    vcfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
            "backbone_last_layer_num": -3,
            "prototype_shape": (40, 256, 1, 1, 1), "num_classes": 4,
            "img_size": 112, "dtype": "bfloat16"}
    vmodel = build_model(vcfg)
    vparams, vstats = init_model(vmodel, jnp.zeros((1, 32, 112, 112, 3)),
                                 seed=0)
    vvars = {"params": vparams, "batch_stats": vstats}
    calib = [jnp.asarray(rng.normal(
        size=(8, 32, 112, 112, 3)).astype(np.float32)) for _ in range(2)]
    qstate = build_qstate(vvars, calibrate_act_scales(vmodel, vvars, calib))
    host_v = jax.tree_util.tree_map(np.asarray, vvars)
    host_q = jax.tree_util.tree_map(np.asarray, qstate)

    for b in (128, 256):
        @jax.jit
        def chained(key, n, b=b):
            x = jax.random.normal(key, (b, 32, 112, 112, 3), jnp.float32)

            def body(i, xc):
                logits = apply_quantized(vmodel, host_v, host_q, xc)[0]
                return xc + 1e-6 * logits.sum()
            return jax.lax.fori_loop(0, n, body, x).sum()

        key = jax.random.PRNGKey(0)
        _measure(f"video_int8_const_b{b}", lambda n, c=chained: c(key, n),
                 b, out)

    # --- 2. image flagship: args vs const at batch 128 -------------------
    icfg = {"name": "XProtoNet", "base_architecture": "resnet18",
            "prototype_shape": (40, 512, 1, 1), "num_classes": 4,
            "img_size": 224, "dtype": "bfloat16"}
    imodel = build_model(icfg)
    iparams, istats = init_model(imodel, jnp.zeros((1, 224, 224, 3)), seed=0)
    ivars = {"params": iparams, "batch_stats": istats}
    host_i = jax.tree_util.tree_map(np.asarray, ivars)
    ib = 128

    @jax.jit
    def img_args(v, key, n):
        x = jax.random.normal(key, (ib, 224, 224, 3), jnp.float32)

        def body(i, xc):
            return xc + 1e-6 * imodel.apply(v, xc, train=False)[0].sum()
        return jax.lax.fori_loop(0, n, body, x).sum()

    @jax.jit
    def img_const(key, n):
        x = jax.random.normal(key, (ib, 224, 224, 3), jnp.float32)

        def body(i, xc):
            return xc + 1e-6 * imodel.apply(host_i, xc,
                                            train=False)[0].sum()
        return jax.lax.fori_loop(0, n, body, x).sum()

    key = jax.random.PRNGKey(0)
    # image batches run in ~3.5 ms — wide points so device time beats jitter
    _measure("image_args_b128", lambda n: img_args(ivars, key, n), ib, out,
             n1=20, n2=220)
    _measure("image_const_b128", lambda n: img_const(key, n), ib, out,
             n1=20, n2=220)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
