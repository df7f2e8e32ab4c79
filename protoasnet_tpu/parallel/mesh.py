"""Device mesh + sharding helpers — the distributed layer.

The reference has NO distributed backend (SURVEY.md §5.8: single GPU via
CUDA_VISIBLE_DEVICES). This module is its TPU-native replacement: a 1-D
``data`` mesh over all chips; train/eval batches are sharded on the batch
axis, params/opt-state are replicated, and XLA inserts the gradient
all-reduce over ICI automatically inside the jitted step. The push scan
reuses the same sharding: per-chip argmin over local batch shards followed
by a global reduce (free, since the argmin runs under jit on sharded
inputs).

Scaling axis per SURVEY.md §5.7: batch/clip dimension only — no sequence
parallelism needed (T' ~ 8 after the backbone).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "shard_batch", "replicate",
           "fsdp_param_shardings", "distributed_requested",
           "maybe_initialize_distributed"]

_ARRAY_KEYS = (
    "cine", "target_AS", "t_len", "interval_idx", "window_start", "window_end",
    "original_length", "valid", "target_AS_dev", "valid_dev",
)


_DIST = {"done": False}


def distributed_requested() -> bool:
    """Env-var-only check (never touches a JAX API, so it is safe to call
    before backend initialization): was a multi-process run configured via
    the standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES variables?"""
    import os

    return ("JAX_COORDINATOR_ADDRESS" in os.environ
            or os.environ.get("JAX_NUM_PROCESSES", "1") not in ("", "1"))


def maybe_initialize_distributed() -> bool:
    """Multi-host pod bring-up: call once at PROCESS ENTRY (main.py /
    explain.py do), before any other JAX API use — ``jax.distributed.
    initialize()`` must run before the XLA backend comes up.

    The decision is made from env vars alone (``distributed_requested``),
    so this never initializes the backend on a single-host run. When a
    multi-process run IS requested but initialize() fails (most commonly
    because some JAX call already brought the backend up), this RAISES
    instead of silently falling back to independent single-host runs —
    each process training on its own local batch and clobbering the shared
    save_dir is strictly worse than a crash. Returns True when running
    multi-process afterwards.
    """
    import os

    if not distributed_requested():
        return False
    if _DIST["done"]:
        return jax.process_count() > 1
    # JAX reads JAX_COORDINATOR_ADDRESS itself but num_processes/process_id
    # only come from cluster auto-detection (Slurm/MPI/TPU-pod metadata) —
    # pass them explicitly when the generic env vars are set so plain
    # multi-host launches (ssh loops, test harnesses) work too.
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES", "").strip():
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ.get("JAX_PROCESS_ID", "0"))
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # TPU-pod runtimes may auto-initialize; a second initialize() then
        # raises "already initialized"-style errors while process_count is
        # already correct. Only that case is benign.
        if jax.process_count() > 1:
            _DIST["done"] = True
            return True
        raise RuntimeError(
            "multi-process run requested (JAX_COORDINATOR_ADDRESS / "
            "JAX_NUM_PROCESSES set) but jax.distributed.initialize() "
            "failed. Call maybe_initialize_distributed() at process entry "
            "before any other JAX API use; refusing to fall back to an "
            "independent single-host run."
        ) from e
    _DIST["done"] = True
    return jax.process_count() > 1


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[Sequence[Any]] = None) -> Mesh:
    """2-D (data, model) mesh for hybrid DP x prototype-TP."""
    if devices is None:
        devices = jax.devices()
    if n_data * n_model > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {n_data * n_model} "
                         f"devices, have {len(devices)}")
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def prototype_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Hybrid-parallel param placement: the prototype dimension P shards
    over the ``model`` axis (prototype_vectors rows, readout kernel rows,
    occurrence module's final kernel columns); everything else replicates.

    The prototype head is tiny relative to the backbone, so this is a
    scaling DEMONSTRATION of GSPMD-propagated tensor parallelism more than
    a perf lever — the backbone stays replicated and batch-sharded, which
    SURVEY.md §5.7 identifies as the right scaling axis for this family.
    """
    repl = NamedSharding(mesh, P())
    model_rows = NamedSharding(mesh, P("model"))
    model_cols = NamedSharding(mesh, P(None, "model"))

    occ_final = None
    if "occurrence_module" in params:
        occ_final = sorted(k for k in params["occurrence_module"]
                           if k.startswith("Dense"))[-1]

    def assign(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if keys[0] == "prototype_vectors":
            return model_rows
        if keys[0] == "last_layer" and keys[-1] == "kernel":
            return model_rows
        if (keys[0] == "occurrence_module" and occ_final is not None
                and keys[1] == occ_final and keys[-1] == "kernel"):
            return model_cols
        return repl

    return jax.tree_util.tree_map_with_path(assign, params)


def fsdp_param_shardings(params: Any, mesh: Mesh, axis: str = "data",
                         min_size: int = 1 << 14) -> Any:
    """ZeRO-3 / FSDP-style placement: every parameter of >= ``min_size``
    elements shards its largest ``axis``-divisible dimension over the mesh;
    GSPMD all-gathers the shards on use in the forward/backward and keeps
    the persistent copy (and anything placed with the same tree — Adam
    moments, grad-accumulator sums) sharded, cutting per-chip state memory
    ~linearly in mesh size. Small leaves replicate (gather latency would
    dominate). Pure placement hints: the jitted step is unchanged.
    """
    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def assign(leaf):
        if getattr(leaf, "size", 0) < min_size:
            return repl
        dims = list(leaf.shape)
        cands = [i for i, d in enumerate(dims) if d % n == 0 and d >= n]
        if not cands:
            return repl
        i = max(cands, key=lambda j: dims[j])
        spec = [None] * len(dims)
        spec[i] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(assign, params)


def opt_state_shardings(opt_state: Any, params: Any, param_shardings: Any,
                        mesh: Mesh) -> Any:
    """Placement tree for optimizer state under FSDP: subtrees that mirror
    the param tree (Adam mu/nu moments, grad-accumulator sums) take the
    param shardings leaf-for-leaf — so the per-chip memory win of ZeRO-3
    covers the 2x Adam state too — while scalar leaves (step counts,
    EmptyState) replicate."""
    repl = NamedSharding(mesh, P())
    pstruct = jax.tree_util.tree_structure(params)

    def mirrors_params(x) -> bool:
        try:
            return jax.tree_util.tree_structure(x) == pstruct
        except Exception:
            return False

    return jax.tree_util.tree_map(
        lambda x: param_shardings if mirrors_params(x) else repl,
        opt_state, is_leaf=mirrors_params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def global_batch_from_local(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Multi-host input path: each process feeds its LOCAL batch shard and
    this assembles the global jax.Arrays
    (jax.make_array_from_process_local_data over the data axis) — the DCN
    scale-out design from SURVEY.md §5.8. On a single process this is
    equivalent to shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    sharding = batch_sharding(mesh)
    out = dict(batch)
    for k in _ARRAY_KEYS:
        if k in out and hasattr(out[k], "shape"):
            out[k] = jax.make_array_from_process_local_data(sharding, out[k])
    return out


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Shard the array fields of a host batch on the batch axis; non-array
    metadata (filenames, step) passes through untouched."""
    sharding = batch_sharding(mesh)
    out = dict(batch)
    for k in _ARRAY_KEYS:
        if k in out and hasattr(out[k], "shape"):
            out[k] = jax.device_put(out[k], sharding)
    return out
