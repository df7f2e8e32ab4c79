"""Model builder: config dict -> flax module + initialized variables.

Parity with the reference registry (model_builder.py:14-25) —
{ProtoPNet, XProtoNet, Video_XProtoNet} — with safe prototype_shape
parsing instead of eval().
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from protoasnet_tpu.models.protopnet import PPNet
from protoasnet_tpu.models.xprotonet import XProtoNet
from protoasnet_tpu.utils.config import parse_prototype_shape

__all__ = ["build_model", "example_input", "MODEL_NAMES"]

MODEL_NAMES = ("ProtoPNet", "XProtoNet", "Video_XProtoNet")


def build_model(model_config: Dict[str, Any], dtype=None):
    """Returns an un-initialized flax module for the config."""
    if dtype is None:
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            model_config.get("dtype", "float32")
        ]
    name = model_config["name"]
    shape = parse_prototype_shape(model_config["prototype_shape"])
    num_classes = int(model_config["num_classes"])
    img_size = int(model_config.get("img_size", 224))
    base_arch = model_config.get("base_architecture", "resnet18")
    head_impl = model_config.get("head_impl", "xla")

    if name == "ProtoPNet":
        return PPNet(
            prototype_shape=shape,
            num_classes=num_classes,
            base_architecture=base_arch,
            img_size=img_size,
            prototype_activation_function=model_config.get(
                "prototype_activation_function", "log"
            ),
            add_on_layers_type=model_config.get("add_on_layers_type", "bottleneck"),
            head_impl=head_impl,
            dtype=dtype,
        )
    if name in ("XProtoNet", "Video_XProtoNet"):
        if name == "Video_XProtoNet" and base_arch not in ("resnet2p1d_18", "r3d_18"):
            raise ValueError(
                "Video_XProtoNet requires a video backbone "
                "(resnet2p1d_18 or r3d_18)")
        return XProtoNet(
            prototype_shape=shape,
            num_classes=num_classes,
            base_architecture=base_arch,
            backbone_last_layer_num=int(model_config.get("backbone_last_layer_num", -3)),
            img_size=img_size,
            head_impl=head_impl,
            remat=bool(model_config.get("remat", False)),
            dtype=dtype,
        )
    raise ValueError(f"Unknown model name {name!r}; options: {MODEL_NAMES}")


def example_input(model_config: Dict[str, Any], data_config: Dict[str, Any],
                  batch_size: int = 1) -> jnp.ndarray:
    """A zero input of the right shape for init/compile."""
    img = int(data_config.get("img_size", 224))
    frames = int(data_config.get("frames", 1))
    if model_config["name"] == "Video_XProtoNet":
        return jnp.zeros((batch_size, frames, img, img, 3), jnp.float32)
    return jnp.zeros((batch_size, img, img, 3), jnp.float32)


@functools.lru_cache(maxsize=None)
def _jitted_init(model):
    """One jitted init per module instance.

    Eager flax init dispatches every op separately (~160 tiny XLA programs
    for the video flagship: 12.4 s/call on this host even with a warm
    persistent compile cache, and ~160 relay round trips on TPU); a single
    jitted program runs in ~2 s warm and produces bit-identical variables
    (threefry is trace-invariant). Memoized because each `model.init`
    access creates a fresh bound method, which would defeat jit's cache.
    """
    return jax.jit(model.init, static_argnames="train")


def init_model(model, sample_input: jnp.ndarray, seed: int = 0):
    """Initialize variables; returns (params, batch_stats)."""
    try:
        init = _jitted_init(model)
    except TypeError:  # unhashable module fields: fall back to eager init
        init = functools.partial(model.init)
    variables = init(jax.random.PRNGKey(seed), sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return params, batch_stats
