"""Functional model surgery: prototype pruning.

Parity with the reference prune_prototypes (ProtoPNet.py:251-274), which
mutates the module in place; here pruning returns new param trees + the
updated prototype metadata. Also handles the XProtoNet family (prunes the
occurrence module's output channels, which the reference never implemented).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["prune_prototypes"]


def prune_prototypes(
    params: Dict,
    class_identity: np.ndarray,
    prototypes_to_prune: Sequence[int],
) -> Tuple[Dict, np.ndarray, List[int]]:
    """Remove the given prototype indices.

    Returns (new_params, new_class_identity, kept_indices). Touches:
    prototype_vectors (rows), last_layer kernel (input rows), and — when an
    occurrence_module exists — its final Dense kernel's output columns.
    """
    p = class_identity.shape[0]
    keep = sorted(set(range(p)) - set(int(i) for i in prototypes_to_prune))
    if not keep:
        raise ValueError("Cannot prune all prototypes")
    keep_arr = np.asarray(keep)

    new_params = dict(params)
    pv = np.asarray(params["prototype_vectors"])
    new_params["prototype_vectors"] = jnp.asarray(pv[keep_arr])

    ll = dict(params["last_layer"])
    dense = dict(ll["Dense_0"])
    kernel = np.asarray(dense["kernel"])  # (P, K)
    dense["kernel"] = jnp.asarray(kernel[keep_arr])
    ll["Dense_0"] = dense
    new_params["last_layer"] = ll

    if "occurrence_module" in params:
        om = dict(params["occurrence_module"])
        # final Dense maps D/2 -> P; prune output columns
        last_name = sorted(k for k in om if k.startswith("Dense"))[-1]
        final = dict(om[last_name])
        k2 = np.asarray(final["kernel"])  # (D/2, P)
        final["kernel"] = jnp.asarray(k2[:, keep_arr])
        om[last_name] = final
        new_params["occurrence_module"] = om

    return new_params, class_identity[keep_arr], keep
