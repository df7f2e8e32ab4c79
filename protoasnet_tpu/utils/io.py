"""Pickle / checkpoint IO.

Checkpoints are flax-serialized pytrees in a single ``.ckpt`` file holding
``{epoch, iteration, params, model_state, opt_state(s), best_metric}`` —
the functional equivalent of the reference torch.save dicts
(/root/reference/src/agents/base.py:143-169). ``last.ckpt`` every epoch,
``model_best.ckpt`` on best mean-F1, threshold-gated named checkpoints.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

__all__ = ["save_pickle", "load_pickle", "save_checkpoint", "load_checkpoint"]


def save_pickle(obj: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, tree
    )


def save_checkpoint(state: Dict[str, Any], path: str) -> None:
    """Serialize a checkpoint pytree dict to ``path`` atomically."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.to_bytes(_to_host(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a checkpoint. With ``target`` the pytree structure (and dtypes)
    are validated against it; without, raw state dicts are returned."""
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)
