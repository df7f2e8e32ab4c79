"""Serving export: serialize the inference function to a StableHLO artifact.

Production-deployment path the reference lacks entirely: the jitted forward
(params baked in as constants? no — passed as inputs) is exported with
``jax.export`` to a portable serialized artifact that a serving binary can
reload and run WITHOUT the model-building Python code. Batch size is a
symbolic dimension, so one artifact serves any batch.

Usage:
    blob = export_inference(model, params, batch_stats, input_shape)
    open("model.jaxexport", "wb").write(blob)
    ...
    fn = load_exported(open("model.jaxexport", "rb").read())
    logits = fn(params_flat, x)   # flat param list + input
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

__all__ = ["export_inference", "load_exported", "save_serving_bundle",
           "load_serving_bundle", "load_serving_bundle_with_spec",
           "bundle_input_spec", "make_sharded_serving_fn",
           "load_trained_agent"]


def make_sharded_serving_fn(model, mesh, qstate=None,
                            uint8_gray: bool = False, variables=None):
    """Data-parallel serving across a device mesh.

    Returns ``fn(variables, x) -> logits`` jitted with the batch sharded
    over the mesh's ``data`` axis and params (+ optional w8a8 qstate)
    replicated. Per-sample logits are independent, so XLA runs each
    chip's shard with ZERO collectives and returns the logits sharded the
    same way — multi-chip serving throughput is additive over ICI-
    connected chips. Feed inputs placed with ``parallel.shard_batch`` (or
    any (b, ...) array — jit reshards automatically); the per-chip batch
    should sit at each chip's serving sweet spot (128 on v5e, BASELINE).

    With ``variables`` given, the weight pytree is bound as COMPILE-TIME
    CONSTANTS and the returned fn takes only ``x``. Serving weights are
    frozen, and constant weights let XLA prepack conv kernel layouts at
    compile time instead of per call: measured **636.6 → 825.2 clips/s
    (+30%)** on the bf16 video flagship at batch 128 on v5e, same
    session (`experiments/const_weights_ab.py`; a host-side bf16 pre-cast
    changes nothing — the win is layout prepacking, not the cast; the
    int8 w8a8 path gains +5.4%, 934.4 → 984.8). The
    exported-bundle path gets this for free (load_serving_bundle closes
    weights over); pass ``variables`` here so live serving matches it.

    The single-artifact export path (export_inference) stays single-chip;
    this is the in-process multi-chip path used by a serving host that
    owns the mesh. With ``qstate`` the backbone runs w8a8 on each chip
    (1.46x measured single-chip, experiments/int8_serving_ab.py).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    batch_sh = NamedSharding(mesh, PartitionSpec("data"))
    repl = NamedSharding(mesh, PartitionSpec())

    if qstate is None:
        def forward(variables, x):
            return model.apply(variables, x, train=False)[0]
    else:
        from protoasnet_tpu.quant import apply_quantized

        def forward(vq, x):
            return apply_quantized(model, vq["variables"], vq["qstate"],
                                   x)[0]

    if uint8_gray:
        from protoasnet_tpu.data.transforms import normalize

        inner = forward

        def forward(variables, x):  # noqa: F811 — on-device eval transform
            xf = normalize(x.astype(jnp.float32) * (1.0 / 255.0))
            xf = jnp.broadcast_to(xf[..., None], xf.shape + (3,))
            return inner(variables, xf)

    if variables is None:
        return jax.jit(forward, in_shardings=(repl, batch_sh),
                       out_shardings=batch_sh)
    # host numpy so jit traces the weights as literals (device arrays
    # would also lift as consts, but numpy matches the bundle path's
    # measured behavior exactly)
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    return jax.jit(lambda x: forward(host_vars, x),
                   in_shardings=(batch_sh,), out_shardings=batch_sh)


def export_inference(model, params, batch_stats, input_shape: Sequence[int],
                     symbolic_batch: bool = True, qstate=None,
                     uint8_gray: bool = False) -> bytes:
    """Serialize ``apply(variables, x) -> logits`` to portable bytes.

    input_shape: per-sample shape WITHOUT the batch dim, e.g.
    (32, 112, 112, 3) for the flagship video model.

    qstate: optional w8a8 state from ``quant.build_qstate`` — the exported
    artifact then runs the int8 backbone (quantization happens at trace
    time, so the StableHLO carries the int8 convs; measured 1.46x serving
    throughput on v5e, experiments/int8_serving_ab.py).

    uint8_gray: the artifact takes raw grayscale uint8 frames (input_shape
    minus the channel dim) and runs the eval-loader transform on device
    (/255, echo normalize, gray->3ch broadcast — data/transforms.py) —
    12x fewer wire + H2D bytes per clip than normalized float32 RGB, the
    same reason the training loader stages uint8 (CLAUDE.md loader rule).
    """
    base = {"params": params, "batch_stats": batch_stats}
    if qstate is None:
        variables = base

        def forward(variables, x):
            return model.apply(variables, x, train=False)[0]
    else:
        from protoasnet_tpu.quant import apply_quantized

        variables = {"variables": base, "qstate": qstate}

        def forward(vq, x):
            return apply_quantized(model, vq["variables"], vq["qstate"],
                                   x)[0]

    x_shape, x_dtype = tuple(input_shape), jnp.float32
    if uint8_gray:
        from protoasnet_tpu.data.transforms import normalize

        assert input_shape[-1] == 3, "expected a trailing channel dim"
        x_shape, x_dtype = tuple(input_shape[:-1]), jnp.uint8
        inner = forward

        def forward(variables, x):  # noqa: F811 — wraps the model forward
            xf = normalize(x.astype(jnp.float32) * (1.0 / 255.0))
            xf = jnp.broadcast_to(xf[..., None], xf.shape + (3,))
            return inner(variables, xf)

    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, *x_shape), x_dtype)
    else:
        x_spec = jax.ShapeDtypeStruct((1, *x_shape), x_dtype)
    var_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
    )
    exported = jexport.export(jax.jit(forward))(var_specs, x_spec)
    return exported.serialize()


def load_exported(blob: bytes) -> Callable:
    """Deserialize an exported artifact; returns fn(variables, x) -> logits."""
    exported = jexport.deserialize(blob)
    return exported.call


def save_serving_bundle(path: str, model, params, batch_stats,
                        input_shape: Sequence[int], qstate=None,
                        uint8_gray: bool = False) -> None:
    """One-file serving bundle: exported StableHLO + weights (npz-in-zip).

    With ``qstate`` the bundle serves the int8 backbone and ships the int8
    kernels (smaller than fp32 and ~1.46x faster on the chip)."""
    blob = export_inference(model, params, batch_stats, input_shape,
                            qstate=qstate, uint8_gray=uint8_gray)
    variables = {"params": params, "batch_stats": batch_stats}
    if qstate is not None:
        variables = {"variables": variables, "qstate": qstate}
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    buf = io.BytesIO()
    np.savez(buf, **{f"w{i}": np.asarray(x) for i, x in enumerate(leaves)})
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("model.stablehlo", blob)
        z.writestr("weights.npz", buf.getvalue())
        z.writestr("treedef.pickle", pickle.dumps(treedef))


def bundle_input_spec(path: str) -> Tuple[Tuple, Any]:
    """(shape, dtype) of a bundle's input x; symbolic dims come back None.

    Lets a serving host (server.py) size warmup buffers without any
    model-building code: the x aval is the last flattened input of the
    exported call (variables leaves first, x last)."""
    with zipfile.ZipFile(path) as z:
        exported = jexport.deserialize(z.read("model.stablehlo"))
    aval = exported.in_avals[-1]
    shape = tuple(d if isinstance(d, int) else None for d in aval.shape)
    return shape, aval.dtype


def load_serving_bundle(path: str) -> Callable:
    """Load a bundle; returns fn(x) -> logits with weights bound."""
    return load_serving_bundle_with_spec(path)[0]


def load_serving_bundle_with_spec(path: str) -> Tuple[Callable, Tuple, Any]:
    """Load a bundle once; returns (fn, input_shape, input_dtype).

    One StableHLO deserialize serves both the callable and the input spec
    (serve_forever previously paid the multi-second deserialize twice)."""
    with zipfile.ZipFile(path) as z:
        exported = jexport.deserialize(z.read("model.stablehlo"))
        npz = np.load(io.BytesIO(z.read("weights.npz")))
        leaves = [npz[f"w{i}"] for i in range(len(npz.files))]
        treedef = pickle.loads(z.read("treedef.pickle"))
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    fn = exported.call
    aval = exported.in_avals[-1]
    shape = tuple(d if isinstance(d, int) else None for d in aval.shape)
    return (lambda x: fn(variables, x)), shape, aval.dtype


# --- deployment CLI -------------------------------------------------------
# python -m protoasnet_tpu.serve export  --run_dir <trained run> --out b.zip
#                                        [--int8] [--calib_batches 4]
#                                        [--uint8_input]
# python -m protoasnet_tpu.serve predict --bundle b.zip --input x.npy
#                                        [--out logits.npy] [--batch 128]
# The reference ships no serving story at all (train/eval scripts only);
# this closes the trained-run -> deployable-artifact -> predictions loop.


def load_trained_agent(run_dir: str):
    """Rebuild the agent from a run dir's dumped config + last.ckpt.

    Returns (agent, input_shape) where input_shape is the per-sample model
    input WITHOUT the batch dim. Shared by the export CLI and the serving
    daemon's live --run_dir mode."""
    import glob
    import os

    import yaml

    from protoasnet_tpu.train.agents import build_agent

    cfgs = sorted(glob.glob(os.path.join(run_dir, "config_*.yml")))
    assert cfgs, f"no dumped config under {run_dir}"
    with open(cfgs[0]) as f:
        config = yaml.safe_load(f)
    config["save_dir"] = run_dir  # auto-resume loads last.ckpt
    config["train"]["save"] = False
    agent = build_agent(config)
    # current_epoch is the reference's resume convention (the index of the
    # last epoch run, 0 after a 1-epoch train); iteration counts micro-steps
    # and is > 0 for ANY trained checkpoint.
    assert agent.current_iteration > 0 or agent.current_epoch > 0, \
        f"no trained checkpoint loaded from {run_dir}"

    data = config.get("data", {})
    s = int(data.get("img_size", 112))
    frames = int(data.get("frames", 32))
    input_shape = (frames, s, s, 3) if frames > 1 else (s, s, 3)
    return agent, input_shape


def _export_cmd(args) -> None:
    agent, input_shape = load_trained_agent(args.run_dir)

    qstate = None
    if args.int8:
        from protoasnet_tpu.quant import calibrate_qstate_from_agent

        qstate = calibrate_qstate_from_agent(agent, args.calib_batches)

    save_serving_bundle(args.out, agent.model, agent.params,
                        agent.batch_stats, input_shape, qstate=qstate,
                        uint8_gray=args.uint8_input)
    import os as _os

    shown = input_shape[:-1] if args.uint8_input else input_shape
    print(f"wrote {args.out} ({_os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"input (b, {', '.join(map(str, shown))})"
          f"{' uint8 gray' if args.uint8_input else ''}"
          f"{', int8 backbone' if qstate is not None else ''})")


def _predict_cmd(args) -> None:
    fn = load_serving_bundle(args.bundle)
    _, want_dtype = bundle_input_spec(args.bundle)
    x = np.load(args.input)
    if x.dtype != want_dtype:
        # same-kind casts only (uint8 -> float32 upcast is fine); float
        # clips fed to a --uint8_input bundle would silently truncate
        # [0,1] floats to 0 — reject, exactly like the daemon's _validate
        if not np.can_cast(x.dtype, want_dtype, casting="same_kind"):
            raise SystemExit(
                f"input dtype {x.dtype} not safely castable to the "
                f"bundle's input dtype {np.dtype(want_dtype).name} "
                f"(uint8 bundles take raw gray frames, not normalized "
                f"float clips)")
        x = x.astype(want_dtype)
    out = []
    for i in range(0, len(x), args.batch):
        # float32: bf16-flagship bundles emit ml_dtypes.bfloat16, which
        # numpy can hold but not format/exp reliably
        out.append(np.asarray(fn(jnp.asarray(x[i:i + args.batch])),
                              np.float32))
    logits = np.concatenate(out)
    if args.out:
        np.save(args.out, logits)
        print(f"wrote {args.out}: logits {logits.shape}")
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    for i, (p, k) in enumerate(zip(probs, probs.argmax(axis=1))):
        print(f"{i}: class {k} p={p[k]:.3f}")


def _tune_cmd(args) -> None:
    """Sweep candidate serving batch sizes on the attached device and
    recommend ``--max_batch`` for the daemon.

    The right serving batch is hardware-specific (128 on a v5e-1 chip,
    BASELINE.md; bigger on pods, smaller on CPU dev hosts), so deployment
    needs a measurement, not a constant. Methodology is bench.py's: each
    candidate runs N forwards of the exported call chained inside ONE
    jitted fori_loop with a data dependence (a logits-derived zero is
    folded back into the input, so nothing can be elided and host
    round-trip costs cancel in a two-point fit over N). OOM at a
    candidate is recorded, not fatal.
    """
    import time

    n1, n2 = args.points
    if n2 <= n1 or n1 < 1:
        raise SystemExit(
            f"--points must be two increasing call counts >= 1 "
            f"(got {n1} {n2}); the two-point fit divides by their gap — "
            f"keep them >= 16 apart so relay jitter cancels")

    fn, shape, dtype = load_serving_bundle_with_spec(args.bundle)
    assert shape[0] is None or len(shape) >= 2
    sample_shape = shape[1:]
    rng = np.random.default_rng(0)
    results: dict = {}
    candidates = [int(b) for b in args.batches.split(",")]

    for b in candidates:
        full = (b,) + sample_shape
        if np.dtype(dtype) == np.uint8:
            x0 = rng.integers(0, 256, size=full).astype(np.uint8)
        else:
            x0 = rng.normal(size=full).astype(np.float32)

        def chained(x, n):
            def body(i, xc):
                logits = fn(xc)
                # data-dependent zero: `sum > inf` is always False but not
                # statically foldable, so the next iteration really waits
                # on this one's logits (dtype-safe for uint8 wires too)
                bump = (logits.sum() > jnp.inf).astype(xc.dtype)
                return xc + bump
            out = jax.lax.fori_loop(0, n, body, x)
            # scalar readback: returning the x-shaped carry would drag the
            # whole batch back over the host link every measurement
            # (hundreds of MB through a relay), drowning the fit
            return out.reshape(-1)[0].astype(jnp.float32)

        chained = jax.jit(chained)
        xd = jnp.asarray(x0.astype(dtype))
        try:
            t0 = time.time()
            float(chained(xd, 1))
            compile_s = time.time() - t0
        except Exception as e:  # noqa: BLE001 — OOM/unsupported candidate
            results[b] = {"error": type(e).__name__}
            print(f"batch {b:4d}: FAILED ({type(e).__name__})", flush=True)
            continue

        def run(n):
            t0 = time.time()
            float(chained(xd, n))
            return time.time() - t0

        ta, tb = run(n1), run(n2)
        per = (tb - ta) / (n2 - n1)
        if per <= 0:
            # jitter beat the signal: a valid marginal is never <= 0.
            # Re-run with wider points rather than report nonsense.
            results[b] = {"error": "degenerate fit — timing jitter beat "
                                   f"the {n2 - n1}-batch signal; rerun "
                                   "with wider --points"}
            print(f"batch {b:4d}: DEGENERATE FIT (ta={ta:.2f}s "
                  f"tb={tb:.2f}s); widen --points", flush=True)
            continue
        results[b] = {"ms_per_batch": round(per * 1000, 2),
                      "samples_per_sec": round(b / per, 1),
                      "compile_s": round(compile_s, 1)}
        print(f"batch {b:4d}: {b / per:8.1f} samples/s "
              f"({per * 1000:7.2f} ms/batch, compile {compile_s:.1f}s)",
              flush=True)

    ok = {b: r for b, r in results.items() if "samples_per_sec" in r}
    if ok:
        best = max(ok, key=lambda b: ok[b]["samples_per_sec"])
        # prefer the smallest batch within 5% of the best rate: it halves
        # p50 latency at low load for ~nothing (128 keeps 96% of the
        # batch-256 ceiling on v5e, BASELINE.md)
        thresh = 0.95 * ok[best]["samples_per_sec"]
        pick = min(b for b in ok if ok[b]["samples_per_sec"] >= thresh)
        print(f"recommended: --max_batch {pick}"
              + (f" (peak rate at {best}, within 5%)" if pick != best else ""))
    else:
        pick = None
        print("no candidate succeeded")
    import json as _json

    print(_json.dumps({"results": results, "recommended_max_batch": pick}))


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(prog="python -m protoasnet_tpu.serve")
    sub = ap.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("export", help="trained run dir -> serving bundle")
    ex.add_argument("--run_dir", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--int8", action="store_true",
                    help="w8a8 backbone (1.46x measured on v5e)")
    ex.add_argument("--uint8_input", action="store_true",
                    help="artifact takes raw grayscale uint8 frames and "
                         "normalizes on device (12x fewer H2D bytes)")
    ex.add_argument("--calib_batches", type=int, default=4)
    ex.set_defaults(fn=_export_cmd)
    pr = sub.add_parser("predict", help="bundle + .npy input -> logits")
    pr.add_argument("--bundle", required=True)
    pr.add_argument("--input", required=True,
                    help=".npy array (b, [T,] H, W, 3) float32")
    pr.add_argument("--out", default=None)
    pr.add_argument("--batch", type=int, default=128)
    pr.set_defaults(fn=_predict_cmd)
    tn = sub.add_parser("tune", help="sweep serving batch sizes on the "
                                     "attached device; recommends "
                                     "--max_batch for the daemon")
    tn.add_argument("--bundle", required=True)
    tn.add_argument("--batches", default="16,32,64,128,256",
                    help="comma-separated candidate batch sizes")
    tn.add_argument("--points", type=int, nargs=2, default=(4, 20),
                    metavar=("N1", "N2"),
                    help="two-point-fit loop lengths (>=16 apart so the "
                         "signal beats per-call jitter on relay hosts)")
    tn.set_defaults(fn=_tune_cmd)
    args = ap.parse_args(argv)
    # Persistent XLA cache (utils/run.py): export re-runs and repeated
    # bundle predicts skip recompiles.
    from protoasnet_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
