"""Post-training w8a8 quantization for the serving path (TPU int8 MXU).

The v5e MXU runs int8xint8->int32 at ~2x its bf16 rate (measured 383 TOPS
vs 202 TF/s on 4096^3 GEMMs, experiments/int8_probe.py), and int8
activations halve the HBM traffic that bounds the low-arithmetic-intensity
temporal convs. This module converts a trained model's backbone convs to
static w8a8 WITHOUT touching any model code:

  1. ``calibrate_act_scales`` runs calibration batches through the model
     with a flax method interceptor that ``sow``s the running absmax of
     every backbone conv input (jit-compatible; one number per conv).
  2. ``build_qstate`` folds the trained kernels to per-output-channel
     symmetric int8 (+ scales) keyed by module path.
  3. ``apply_quantized`` re-runs the model under a second interceptor that
     swaps each calibrated ``nn.Conv`` for: static-scale int8 quantize ->
     int8 conv (int32 accumulate on the MXU) -> per-channel dequant.

Scheme: symmetric int8, per-tensor static activation scales (absmax/127
from calibration; post-ReLU inputs use the non-negative half — effectively
7-bit — keeping the conv free of zero-point cross terms), per-output-
channel weight scales. Everything outside the backbone (add-on layers,
occurrence module, the parity-critical prototype head) runs untouched at
the model's own precision.

The reference has no quantization story; this is a deployment subsystem
the TPU port adds (serving export lives in serve.py).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "path_key",
    "calibrate_act_scales",
    "calibrate_qstate_from_agent",
    "build_qstate",
    "apply_quantized",
    "default_backbone_filter",
]

_SPATIAL, _BN_MID, _TEMPORAL = "spatial", "bn_mid", "temporal"


def _pair_paths(spatial_key: str) -> Tuple[str, str]:
    """Conv2Plus1D sibling paths for a ``.../spatial`` conv key.

    The factorized block (models/backbones/r2plus1d.py::Conv2Plus1D) always
    names its children spatial/bn_mid/temporal; build_qstate verifies the
    BN params actually exist before folding, so a model that breaks the
    convention simply doesn't fold (and stays on the per-conv path).
    """
    prefix = spatial_key[: -len(_SPATIAL)]
    return prefix + _BN_MID, prefix + _TEMPORAL

Path = Tuple[str, ...]


def path_key(path: Path) -> str:
    """Module path -> string key ("/"-joined): jax.export bundles require
    string dict keys, so scales/qstate trees are keyed by this form."""
    return "/".join(path)


def default_backbone_filter(path: Path) -> bool:
    """Quantize only backbone convs (the FLOPs majority); heads stay put."""
    return len(path) > 0 and path[0] == "cnn_backbone"


def _is_plain_conv(m: nn.Module) -> bool:
    """True for the vanilla convs we know how to quantize exactly."""
    if not isinstance(m, nn.Conv):
        return False
    if getattr(m, "feature_group_count", 1) != 1:
        return False
    for attr in ("kernel_dilation", "input_dilation"):
        v = getattr(m, attr, None)
        if v is None or isinstance(v, int):
            if v not in (None, 1):
                return False
        elif any(d != 1 for d in v):
            return False
    return True


def calibrate_act_scales(model, variables, batches: Sequence[Any],
                         path_filter: Callable[[Path], bool] = default_backbone_filter,
                         pass_train: bool = True,
                         **apply_kwargs) -> Dict[Path, jnp.ndarray]:
    """Run ``batches`` through ``model`` recording each conv input's absmax.

    Returns {path_key(module_path): scalar activation scale (absmax / 127)}.
    The forward per batch is jitted; absmax reduces across batches on host.
    """

    def interceptor(next_fn, args, kwargs, context):
        m = context.module
        if (_is_plain_conv(m) and context.method_name == "__call__"
                and path_filter(m.path)):
            x = args[0]
            m.sow("act_stats", "absmax",
                  jnp.max(jnp.abs(x)).astype(jnp.float32),
                  reduce_fn=jnp.maximum,
                  init_fn=lambda: jnp.zeros((), jnp.float32))
        return next_fn(*args, **kwargs)

    if pass_train:
        apply_kwargs = {"train": False, **apply_kwargs}

    @jax.jit
    def one_batch(variables, x):
        with nn.intercept_methods(interceptor):
            _, upd = model.apply(variables, x, mutable=["act_stats"],
                                 **apply_kwargs)
        return upd["act_stats"]

    absmax: Dict[Path, jnp.ndarray] = {}

    def _walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                _walk(v, prefix + (k,))
            else:  # leaf named "absmax" at the conv module's path
                key = path_key(prefix)
                cur = absmax.get(key)
                val = jnp.asarray(v, jnp.float32)
                absmax[key] = val if cur is None else jnp.maximum(cur, val)

    for x in batches:
        _walk(jax.device_get(one_batch(variables, x)), ())

    return {p: jnp.maximum(a, 1e-8) / 127.0 for p, a in absmax.items()}


def calibrate_qstate_from_agent(agent, calib_batches: int = 4,
                                **calib_kwargs):
    """Calibrate + build a w8a8 qstate from a trained agent's train loader.

    The shared serve/export recipe: both ``serve.py export --int8`` and
    ``server.py serve_live --int8`` call this, so the calibration data
    source (train-loader batches, ``calib_batches`` of them) can't drift
    between the two CLIs.
    """
    variables = {"params": agent.params, "batch_stats": agent.batch_stats}
    calib = []
    for batch in agent.data_loaders["train"]:
        calib.append(batch["cine"])
        if len(calib) >= calib_batches:
            break
    scales = calibrate_act_scales(agent.model, variables, calib,
                                  **calib_kwargs)
    qstate = build_qstate(variables, scales)
    logging.info(f"calibrated {len(scales)} convs for w8a8")
    return qstate


def _params_at(params, key: str):
    node = params
    for k in key.split("/") if key else ():
        node = node[k]
    return node


def build_qstate(variables, act_scales: Dict[str, jnp.ndarray],
                 fold_conv2plus1d: bool = False,
                 fold_min_channels: int = 288
                 ) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Per-output-channel symmetric int8 kernels for every calibrated conv.

    Returns a pytree (dict keyed by module path) safe to pass through jit:
      {path_key: {"w_q": int8 kernel, "w_scale": (cout,) f32,
                  "a_scale": scalar f32[, "bias": (cout,) f32]}}

    With ``fold_conv2plus1d`` (OFF by default — see below), every
    calibrated Conv2Plus1D spatial/temporal pair with at least
    ``fold_min_channels`` mid channels gets a fused int8-resident epilogue:
    the spatial entry carries per-channel ``fold_m``/``fold_b`` folding the
    mid BatchNorm (eval stats), ReLU, and the temporal conv's activation
    quantization into one ``clip(round(i32*M + B), 0, 127)`` int8 emit.
    The tensor between the two convs then lives in HBM as int8 (1 byte vs
    2 for bf16) — the factorized temporal convs are the bandwidth-bound
    ops, so their input traffic halves — and is mathematically the exact
    quantization of relu(bn(conv(x))) (round/clip commute with the ReLU
    max at 0), minus one bf16 rounding the unfolded path takes.

    Why OFF by default — a measured negative (v5e, flagship serving at
    batch 128, experiments/int8_serving_ab.py): in ISOLATED pair probes
    folding wins at deep geometries (288/460/576 mid channels at
    28x28/14x14: 1.1-5.4x) and loses at the early high-resolution ones
    (144/230 mid at 56x56: ~0.84x, for every epilogue formulation tried —
    f32/bf16, round/truncate). But end-to-end even the selective >=288
    fold runs 0.97x of the unfolded path (906 vs 934 clips/s), and
    folding everything runs 0.88x — the int8-resident intermediates
    perturb XLA's layout/fusion choices beyond the pair. The fold math
    itself is exact and pinned by tests; flip it on per-deploy only with
    a same-session A/B in hand.
    """
    qstate: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path, a_scale in act_scales.items():
        leaf = _params_at(variables["params"], path)
        w = jnp.asarray(leaf["kernel"], jnp.float32)
        reduce_axes = tuple(range(w.ndim - 1))
        w_absmax = jnp.maximum(jnp.max(jnp.abs(w), axis=reduce_axes), 1e-8)
        w_scale = w_absmax / 127.0
        w_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
        entry = {"w_q": w_q, "w_scale": w_scale,
                 "a_scale": jnp.asarray(a_scale, jnp.float32)}
        if "bias" in leaf:
            entry["bias"] = jnp.asarray(leaf["bias"], jnp.float32)
        qstate[path] = entry

    if not fold_conv2plus1d:
        return qstate
    for path in list(qstate):
        if not (path == _SPATIAL or path.endswith("/" + _SPATIAL)):
            continue
        bn_key, temporal_key = _pair_paths(path)
        if temporal_key not in qstate:
            continue
        if qstate[path]["w_q"].shape[-1] < fold_min_channels:
            continue  # measured: early high-res pairs run faster unfolded
        try:
            bn_p = _params_at(variables["params"], bn_key)
            bn_s = _params_at(variables["batch_stats"], bn_key)
            gamma = jnp.asarray(bn_p["scale"], jnp.float32)
            beta = jnp.asarray(bn_p["bias"], jnp.float32)
            mean = jnp.asarray(bn_s["mean"], jnp.float32)
            var = jnp.asarray(bn_s["var"], jnp.float32)
        except (KeyError, TypeError):
            continue  # naming convention not met -> per-conv path
        q = qstate[path]
        a_t = qstate[temporal_key]["a_scale"]
        # eval BN epsilon: models/norm.py::BatchNorm default (1e-5)
        inv_std = gamma * jax.lax.rsqrt(var + 1e-5)
        bias = q.get("bias", jnp.zeros_like(mean))
        q["fold_m"] = q["a_scale"] * q["w_scale"] * inv_std / a_t
        q["fold_b"] = ((bias - mean) * inv_std + beta) / a_t
    return qstate


_DIM_NUMS = {1: ("NWC", "WIO", "NWC"),
             2: ("NHWC", "HWIO", "NHWC"),
             3: ("NDHWC", "DHWIO", "NDHWC")}


def _canon_strides(strides, rank: int):
    if strides is None:
        return (1,) * rank
    if isinstance(strides, int):
        return (strides,) * rank
    return tuple(strides)


def _canon_padding(padding, rank: int):
    """flax nn.Conv padding (str | int | seq[int] | seq[(lo, hi)]) -> lax."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return ((padding, padding),) * rank
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return tuple(out)


def apply_quantized(model, variables, qstate, x, method=None,
                    pass_train: bool = True, **apply_kwargs):
    """``model.apply`` with every conv in ``qstate`` swapped to int8.

    Pure in (variables, qstate, x) — jit it with all three as arguments
    (qstate's dict STRUCTURE, incl. fold_m presence, is static under jit).
    Convs NOT in qstate (heads, stem space-to-depth) run unchanged.

    Folded Conv2Plus1D pairs (see build_qstate): the spatial conv emits
    int8 directly, the folded bn_mid is intercepted to identity, the
    model's own nn.relu is a no-op on the non-negative int8 codes, and
    the temporal conv consumes the int8 input without re-quantizing.
    """
    from protoasnet_tpu.models.norm import BatchNorm

    if pass_train:
        apply_kwargs = {"train": False, **apply_kwargs}

    folded_bns = {_pair_paths(p)[0] for p, q in qstate.items()
                  if "fold_m" in q}
    # compute dtype of the pending int8-resident pair (trace-order carry:
    # a folded spatial conv always reaches its temporal partner before any
    # other quantized conv can run)
    pending_dtype = []

    def interceptor(next_fn, args, kwargs, context):
        m = context.module
        key = path_key(m.path)
        if (isinstance(m, BatchNorm) and context.method_name == "__call__"
                and key in folded_bns):
            return args[0]  # folded into the spatial conv's epilogue
        if (isinstance(m, nn.Conv) and context.method_name == "__call__"
                and key in qstate):
            q = qstate[key]
            xin = args[0]
            rank = xin.ndim - 2
            if xin.dtype == jnp.int8:  # folded pair's temporal side
                out_dtype = pending_dtype.pop()
                xq = xin
            else:
                out_dtype = xin.dtype
                inv = 1.0 / q["a_scale"]
                xq = jnp.clip(jnp.round(xin.astype(jnp.float32) * inv),
                              -127, 127).astype(jnp.int8)
            dn = lax.conv_dimension_numbers(xin.shape, q["w_q"].shape,
                                            _DIM_NUMS[rank])
            y = lax.conv_general_dilated(
                xq, q["w_q"], _canon_strides(m.strides, rank),
                _canon_padding(m.padding, rank),
                dimension_numbers=dn, preferred_element_type=jnp.int32)
            if "fold_m" in q:
                pending_dtype.append(out_dtype)
                return jnp.clip(
                    jnp.round(y.astype(jnp.float32) * q["fold_m"]
                              + q["fold_b"]), 0, 127).astype(jnp.int8)
            y = y.astype(jnp.float32) * (q["a_scale"] * q["w_scale"])
            if "bias" in q:
                y = y + q["bias"]
            return y.astype(out_dtype)
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        if method is None:
            return model.apply(variables, x, **apply_kwargs)
        return model.apply(variables, x, method=method, **apply_kwargs)
