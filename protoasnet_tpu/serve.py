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
           "load_serving_bundle"]


def export_inference(model, params, batch_stats, input_shape: Sequence[int],
                     symbolic_batch: bool = True, qstate=None) -> bytes:
    """Serialize ``apply(variables, x) -> logits`` to portable bytes.

    input_shape: per-sample shape WITHOUT the batch dim, e.g.
    (32, 112, 112, 3) for the flagship video model.

    qstate: optional w8a8 state from ``quant.build_qstate`` — the exported
    artifact then runs the int8 backbone (quantization happens at trace
    time, so the StableHLO carries the int8 convs; measured 1.46x serving
    throughput on v5e, experiments/int8_serving_ab.py).
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

    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, *input_shape), jnp.float32)
    else:
        x_spec = jax.ShapeDtypeStruct((1, *input_shape), jnp.float32)
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
                        input_shape: Sequence[int], qstate=None) -> None:
    """One-file serving bundle: exported StableHLO + weights (npz-in-zip).

    With ``qstate`` the bundle serves the int8 backbone and ships the int8
    kernels (smaller than fp32 and ~1.46x faster on the chip)."""
    blob = export_inference(model, params, batch_stats, input_shape,
                            qstate=qstate)
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


def load_serving_bundle(path: str) -> Callable:
    """Load a bundle; returns fn(x) -> logits with weights bound."""
    with zipfile.ZipFile(path) as z:
        fn = load_exported(z.read("model.stablehlo"))
        npz = np.load(io.BytesIO(z.read("weights.npz")))
        leaves = [npz[f"w{i}"] for i in range(len(npz.files))]
        treedef = pickle.loads(z.read("treedef.pickle"))
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    return lambda x: fn(variables, x)
