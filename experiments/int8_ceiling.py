#!/usr/bin/env python
"""Int8 serving ceiling study (VERDICT r4 item 2).

Measured r4 state: int8 const serving 989.8 clips/s = ~39% of int8 peak,
vs bf16 const at 824.7 = 65.5% of bf16 peak — the int8 advantage is only
1.20x for a 2x peak-rate format. This script decides between "real
headroom" and "structural ceiling" with the same evidentiary quality as
the Pallas negative result:

1. **Analytic per-conv roofline** (trace-only, runs with the relay down):
   walks the eval jaxpr, and for every conv computes MXU time at the
   format's peak AND HBM time for its activation/weight traffic — int8
   modeled both with the activation-quantize pass fused into the
   producer (best case) and as a separate pass (worst case). Summing
   max(MXU, HBM) per conv gives the format's analytic floor; the int8
   floor / bf16 floor ratio is the most speedup the memory system allows
   — BEFORE any XLA inefficiency.

2. **Selective-quantization A/B on chip** (const-bound, batch 128,
   device-generated inputs — the shipped serving configuration): full
   backbone int8 (default) vs keeping the bandwidth-bound front of the
   net (stem / stem+layer1) in bf16 vs quantizing only the deep stage.
   The folding study already showed 56x56 pairs LOSE at int8 in
   isolation (0.84x); if that holds end-to-end, selective > full.

3. **Amdahl check**: from the measured bf16 time and its MXU fraction,
   predict the int8 time if conv FLOPs ran exactly 2x and everything
   else stayed; the measured-vs-predicted gap is XLA's int8 lowering
   overhead (requant VPU work, fusion breaks).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/int8_ceiling.py
     [--analytic-only]   (no device needed)

MEASURED RESULTS (v5e-1, 2026-08-20) — CONCLUSION: structural ceiling.

  analytic floors (batch 128): bf16 119.7 ms (1069 clips/s); int8 with
  the activation-quantize pass producer-fused 67.7 ms (1890), fused into
  the consuming conv 86.8 ms (1475), unfused 126.0 ms (1016).

  measured (const-bound):
    bf16_const              823.6 clips/s   (77% of its roofline floor)
    int8_full               990.5 clips/s   (97.5% of the UNFUSED int8
                                             floor — the lowering runs a
                                             separate quantize pass)
    int8_no_stem            976.5    selective quantization is
    int8_L2plus             948.8    monotonically WORSE: end-to-end,
    int8_L3_only            857.8    every quantized conv helps, even
                                     the 56x56 ones that lose in
                                     isolated pair probes
    int8_full_plus_heads    990.9    (= int8_full: the add-on/occurrence
                                     heads are nn.Dense, not nn.Conv, so
                                     the conv filter matches nothing —
                                     and at ~2% of FLOPs, HBM-bound at
                                     14x14, they are not a lever anyway)

  Amdahl: bf16 155.4 ms = 101.2 MXU-at-peak + 54.2 other; a perfect
  int8 lowering (conv FLOPs exactly 2x, nothing else changes) would
  give 104.8 ms (1221 clips/s); measured int8_full is 23% above that
  bound, fully explained by the unfused quantize pass's extra HBM
  traffic (the unfused roofline predicts exactly this: +20 ms).

  Reading: 990 clips/s IS the int8 ceiling for an XLA lowering that
  materializes quantized activations. The remaining 1.5x (to the
  producer-fused floor) needs the quantize folded into the producing
  op's epilogue across conv boundaries — exactly what the int8-resident
  Conv2Plus1D fold (quant.py fold_conv2plus1d) implements, and that
  measured NEGATIVE end-to-end (0.97x) because the int8 intermediates
  perturb XLA's global layout choices. Both ends are now measured: the
  gap is structural to the XLA int8 story on this chip, not headroom.
"""
from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

# v5e public spec
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
HBM_BW = 819e9  # bytes/s

B = 128
VCFG = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
        "backbone_last_layer_num": -3, "prototype_shape": (40, 256, 1, 1, 1),
        "num_classes": 4, "img_size": 112, "dtype": "bfloat16"}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# 1. analytic roofline
# --------------------------------------------------------------------------

def collect_convs(fn, *args, **kwargs):
    """All conv_general_dilated eqns in trace order: (out_shape, rhs_shape,
    in_shape, flops)."""
    import jax
    import jax.extend.core

    convs = []

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
                out = eqn.outvars[0].aval
                dn = eqn.params["dimension_numbers"]
                # same loud-failure policy as utils/flops.py::_conv_flops:
                # batch-grouped convs contract over batch slices, which the
                # output-shape formula below does not model — refuse rather
                # than silently skew the roofline floors (feature groups
                # need no factor: c_in from the rhs is already per-group)
                assert eqn.params.get("batch_group_count", 1) == 1, (
                    "batch-grouped conv found — collect_convs' FLOP "
                    "formula does not model it")
                k_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
                c_in = rhs.shape[dn.rhs_spec[1]]
                fl = 2.0 * math.prod(out.shape) * c_in * k_spatial
                convs.append((tuple(out.shape), tuple(rhs.shape),
                              tuple(lhs.shape), fl))
            for v in eqn.params.values():
                for j in _jaxprs(v):
                    walk(j)

    def _jaxprs(v):
        if isinstance(v, jax.extend.core.ClosedJaxpr):
            yield v.jaxpr
        elif isinstance(v, jax.extend.core.Jaxpr):
            yield v
        elif isinstance(v, (tuple, list)):
            for x in v:
                yield from _jaxprs(x)

    walk(jax.make_jaxpr(fn)(*args, **kwargs).jaxpr)
    return convs


def roofline(convs):
    """Per-conv and total analytic floors for bf16 and int8 paths."""
    rows, tot = [], {"bf16": 0.0, "i8_fused": 0.0, "i8_consumer": 0.0,
                     "i8_unfused": 0.0, "flops": 0.0}
    for out, rhs, lhs, fl in convs:
        n_in, n_out, n_w = (math.prod(lhs), math.prod(out), math.prod(rhs))
        t_bf = max(fl / PEAK_BF16, (2 * n_in + 2 * n_out + 2 * n_w) / HBM_BW)
        # int8 conv: int8 weights, bf16 output (dequant fused into the
        # epilogue). Activation-quantize placement decides input traffic:
        #   producer-fused: upstream op emits int8 -> conv reads 1 B/elem
        #   consumer-fused: conv reads bf16, quantizes in-core -> 2 B/elem
        #   unfused: separate pass (read 2 + write 1) + conv read 1 -> 4 B
        t_i8f = max(fl / PEAK_INT8, (n_in + 2 * n_out + n_w) / HBM_BW)
        t_i8c = max(fl / PEAK_INT8, (2 * n_in + 2 * n_out + n_w) / HBM_BW)
        t_i8u = max(fl / PEAK_INT8, (4 * n_in + 2 * n_out + n_w) / HBM_BW)
        rows.append((out, rhs, fl, t_bf, t_i8f, t_i8c, t_i8u))
        tot["bf16"] += t_bf
        tot["i8_fused"] += t_i8f
        tot["i8_consumer"] += t_i8c
        tot["i8_unfused"] += t_i8u
        tot["flops"] += fl
    return rows, tot


def analytic_report():
    import jax.numpy as jnp

    from protoasnet_tpu.models.builder import build_model, init_model

    model = build_model(VCFG)
    params, stats = init_model(model, jnp.zeros((1, 32, 112, 112, 3)), seed=0)
    variables = {"params": params, "batch_stats": stats}
    x = jnp.zeros((B, 32, 112, 112, 3), jnp.float32)
    convs = collect_convs(
        lambda v, xx: model.apply(v, xx, train=False), variables, x)
    rows, tot = roofline(convs)

    print(f"\n== analytic roofline, batch {B} "
          f"(bf16 peak {PEAK_BF16/1e12:.0f} TF/s, int8 {PEAK_INT8/1e12:.0f} "
          f"TOPS, HBM {HBM_BW/1e9:.0f} GB/s) ==")
    print(f"{'out_shape':>24s} {'kernel':>20s} {'GFLOP':>8s} "
          f"{'bf16ms':>7s} {'i8f_ms':>7s} {'i8c_ms':>7s} {'i8u_ms':>7s} "
          f"{'bound':>5s}")
    groups = {}
    for out, rhs, fl, t_bf, t_i8f, t_i8c, t_i8u in rows:
        bound = "MXU" if fl / PEAK_INT8 >= t_i8c else "HBM"
        h = out[2] if len(out) == 5 else out[1]
        g = groups.setdefault(h, [0.0, 0.0, 0.0, 0.0, 0.0])
        g[0] += fl; g[1] += t_bf; g[2] += t_i8f; g[3] += t_i8c; g[4] += t_i8u
        print(f"{str(out):>24s} {str(rhs):>20s} {fl/1e9:8.1f} "
              f"{t_bf*1e3:7.2f} {t_i8f*1e3:7.2f} {t_i8c*1e3:7.2f} "
              f"{t_i8u*1e3:7.2f} {bound:>5s}")
    print("\n-- grouped by output spatial size --")
    for h in sorted(groups, reverse=True):
        fl, t_bf, t_i8f, t_i8c, t_i8u = groups[h]
        print(f"  H={h:3d}: {fl/1e9:8.1f} GFLOP  bf16 {t_bf*1e3:6.2f} ms  "
              f"i8 fused/consumer/unfused {t_i8f*1e3:6.2f} /{t_i8c*1e3:6.2f} "
              f"/{t_i8u*1e3:6.2f}  (speedups {t_bf/t_i8f:4.2f} /"
              f"{t_bf/t_i8c:4.2f} /{t_bf/t_i8u:4.2f}x)")
    print(f"\n  TOTAL: {tot['flops']/1e9:.1f} GFLOP   "
          f"bf16 floor {tot['bf16']*1e3:.2f} ms ({B/tot['bf16']:.0f} clips/s)"
          f"   i8 fused {tot['i8_fused']*1e3:.2f} ms ({B/tot['i8_fused']:.0f})"
          f"   i8 consumer {tot['i8_consumer']*1e3:.2f} ms "
          f"({B/tot['i8_consumer']:.0f})   i8 unfused "
          f"{tot['i8_unfused']*1e3:.2f} ms ({B/tot['i8_unfused']:.0f})")
    print(f"  max analytic int8 speedup: fused {tot['bf16']/tot['i8_fused']:.2f}x,"
          f" consumer {tot['bf16']/tot['i8_consumer']:.2f}x,"
          f" unfused {tot['bf16']/tot['i8_unfused']:.2f}x")
    return tot


# --------------------------------------------------------------------------
# 2/3. on-chip selective A/B + Amdahl
# --------------------------------------------------------------------------

def stage_of(path) -> int:
    """0 = stem, i = layer i. path is the flax module path tuple."""
    for part in path:
        if part.startswith("layer"):
            return int(part[len("layer")].replace("_", ""))
    return 0


def measured_report(tot):
    import jax
    import jax.numpy as jnp

    from protoasnet_tpu.models.builder import build_model, init_model
    from protoasnet_tpu.quant import (apply_quantized, build_qstate,
                                      calibrate_act_scales,
                                      default_backbone_filter)
    from protoasnet_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    log(f"device: {jax.devices()[0]}")
    out = {}
    rng = np.random.default_rng(0)
    model = build_model(VCFG)
    params, stats = init_model(model, jnp.zeros((1, 32, 112, 112, 3)), seed=0)
    variables = {"params": params, "batch_stats": stats}
    host_v = jax.tree_util.tree_map(np.asarray, variables)
    calib = [jnp.asarray(rng.normal(
        size=(8, 32, 112, 112, 3)).astype(np.float32)) for _ in range(2)]

    def measure(name, apply_fn, n1=3, n2=13):
        @jax.jit
        def chained(key, n):
            x = jax.random.normal(key, (B, 32, 112, 112, 3), jnp.float32)

            def body(i, xc):
                return xc + 1e-6 * apply_fn(xc).sum()
            return jax.lax.fori_loop(0, n, body, x).sum()

        key = jax.random.PRNGKey(0)
        t0 = time.time()
        float(chained(key, 1))
        compile_s = time.time() - t0
        t0 = time.time(); float(chained(key, n1)); ta = time.time() - t0
        t0 = time.time(); float(chained(key, n2)); tb = time.time() - t0
        per = (tb - ta) / (n2 - n1)
        out[name] = round(B / per, 1)
        print(f"{name:28s} {B / per:8.1f} clips/s  ({per * 1e3:6.1f} ms, "
              f"compile {compile_s:.0f}s)", flush=True)
        return per

    # bf16 const baseline
    t_bf = measure("bf16_const",
                   lambda x: model.apply(host_v, x, train=False)[0])

    variants = [
        ("int8_full", default_backbone_filter),
        ("int8_no_stem", lambda p: default_backbone_filter(p)
         and stage_of(p) >= 1),
        ("int8_L2plus", lambda p: default_backbone_filter(p)
         and stage_of(p) >= 2),
        ("int8_L3_only", lambda p: default_backbone_filter(p)
         and stage_of(p) >= 3),
        ("int8_full_plus_heads", lambda p: len(p) > 0 and p[0] in
         ("cnn_backbone", "add_on_layers", "occurrence_module")),
    ]
    t_full = None
    for name, filt in variants:
        scales = calibrate_act_scales(model, variables, calib,
                                      path_filter=filt)
        qstate = build_qstate(variables, scales)
        host_q = jax.tree_util.tree_map(np.asarray, qstate)
        log(f"{name}: {len(scales)} convs quantized")
        per = measure(name, lambda x, q=host_q: apply_quantized(
            model, host_v, q, x)[0])
        if name == "int8_full":
            t_full = per

    # Amdahl: measured bf16 time splits into MXU-at-peak + other;
    # halving the MXU part bounds what a perfect int8 lowering achieves.
    mxu = tot["flops"] / PEAK_BF16
    other = max(t_bf - mxu, 0.0)
    pred = mxu / 2 + other
    print(f"\nAmdahl: bf16 {t_bf*1e3:.1f} ms = MXU {mxu*1e3:.1f} + other "
          f"{other*1e3:.1f}; perfect-int8 prediction {pred*1e3:.1f} ms "
          f"({B/pred:.0f} clips/s)")
    if t_full:
        print(f"measured int8_full {t_full*1e3:.1f} ms -> XLA int8 lowering "
              f"overhead {(t_full - pred)*1e3:.1f} ms "
              f"({(t_full/pred - 1)*100:.0f}% above the Amdahl bound)")
    print(json.dumps(out))


def main():
    if "--analytic-only" in sys.argv:
        # trace-only: pin CPU so the analytic pass runs with the relay down
        import jax
        jax.config.update("jax_platforms", "cpu")
    tot = analytic_report()
    if "--analytic-only" not in sys.argv:
        measured_report(tot)


if __name__ == "__main__":
    main()
