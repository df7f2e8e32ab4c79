"""ImageNet-stats preprocessing helpers.

Parity with the reference (src/utils/preprocess.py:1-37): mean/std
normalization and its inverse, used by the classic ProtoPNet push path when
inputs arrive un-normalized. Channels-last.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["IMAGENET_MEAN", "IMAGENET_STD", "preprocess_input_function",
           "undo_preprocess_input_function"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def preprocess_input_function(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) in [0, 1] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def undo_preprocess_input_function(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return x * std + mean
