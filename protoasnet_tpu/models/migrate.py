"""Migrate trained REFERENCE checkpoints into this framework.

The reference saves torch ``state_dict``s with its own module layout
(/root/reference/src/agents/base.py:143-149: {epoch, iteration, state_dict,
optimizer}); the model keys follow Video_XProtoNet / XProtoNet / PPNet
(cnn_backbone.backbone.{i}... for the r2p1d wrapper, add_on_layers.{i},
occurrence_module.{i}, prototype_vectors, last_layer.weight). This module
converts those into our flax (params, batch_stats) trees so a user of the
reference can load a TRAINED model here and keep identical outputs
(fp32 tolerance — see tests/test_migrate.py).

CLI: python -m protoasnet_tpu.models.migrate <ref.pth> <out.ckpt> \
        --config_path=<our yml>
Reverse (our trained trees -> reference-layout .pth the torch code can
load): add --to_reference. Both directions roundtrip bit-identically
(tests/test_migrate.py).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import numpy as np

from protoasnet_tpu.models.torch_import import (
    convert_r2plus1d,
    convert_resnet2d,
)

__all__ = ["convert_reference_state_dict", "export_reference_state_dict"]


def _dense_from_conv(sd, key, bias=True) -> Dict[str, np.ndarray]:
    """1x1(x1) conv weight (O, I, 1...) -> Dense {kernel (I, O), bias}."""
    w = np.asarray(sd[f"{key}.weight"])
    out = {"kernel": w.reshape(w.shape[0], w.shape[1]).T}
    if bias:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_reference_state_dict(
    sd: Dict[str, Any], model_config: Dict[str, Any]
) -> Tuple[Dict, Dict]:
    """Reference model state_dict -> (params, batch_stats) for build_model.

    Supports Video_XProtoNet / XProtoNet (r2p1d or resnet backbones) and
    PPNet (resnet backbones).
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    name = model_config["name"]
    arch = model_config.get("base_architecture", "resnet18")

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # ---- backbone
    if arch == "resnet2p1d_18":
        # reference wrapper: cnn_backbone.backbone.{0..} = Sequential of
        # torchvision children (0=stem, 1..=layers) — rename back to
        # torchvision keys and reuse the zoo converter
        bsd = _strip_prefix(sd, "cnn_backbone.backbone.")
        tv = {}
        n_stages = 0
        for k, v in bsd.items():
            idx, rest = k.split(".", 1)
            idx = int(idx)
            if idx == 0:
                tv[f"stem.{rest}"] = v
            else:
                tv[f"layer{idx}.{rest}"] = v
                n_stages = max(n_stages, idx)
        bp, bs = convert_r2plus1d(tv, num_stages=n_stages)
        params["cnn_backbone"], stats["cnn_backbone"] = bp, bs
        backbone_key = "cnn_backbone"
    else:
        prefix = "cnn_backbone." if any(
            k.startswith("cnn_backbone.") for k in sd) else "features."
        bp, bs = convert_resnet2d(_strip_prefix(sd, prefix), arch)
        backbone_key = "cnn_backbone" if name != "ProtoPNet" else "features"
        params[backbone_key], stats[backbone_key] = bp, bs

    # ---- heads
    if name in ("XProtoNet", "Video_XProtoNet"):
        params["add_on_layers"] = {
            "Dense_0": _dense_from_conv(sd, "add_on_layers.0"),
            "Dense_1": _dense_from_conv(sd, "add_on_layers.2"),
        }
        params["occurrence_module"] = {
            "Dense_0": _dense_from_conv(sd, "occurrence_module.0"),
            "Dense_1": _dense_from_conv(sd, "occurrence_module.2"),
            "Dense_2": _dense_from_conv(sd, "occurrence_module.4", bias=False),
        }
        pv = np.asarray(sd["prototype_vectors"])
        params["prototype_vectors"] = pv.reshape(pv.shape[0], pv.shape[1])
    elif name == "ProtoPNet":
        add_on = {}
        conv_keys = sorted(
            {int(k.split(".")[1]) for k in sd
             if k.startswith("add_on_layers.") and k.endswith(".weight")}
        )
        for i, idx in enumerate(conv_keys):
            add_on[f"Dense_{i}"] = _dense_from_conv(sd, f"add_on_layers.{idx}")
        params["add_on_layers"] = add_on
        pv = np.asarray(sd["prototype_vectors"])  # (P, D, kh, kw)
        params["prototype_vectors"] = np.transpose(pv, (0, 2, 3, 1))
    else:
        raise ValueError(f"Unknown model name {name!r}")

    params["last_layer"] = {
        "Dense_0": {"kernel": np.asarray(sd["last_layer.weight"]).T}
    }
    return params, stats


def _conv_from_dense(dense: Dict[str, Any], rank: int) -> Dict[str, np.ndarray]:
    """Inverse of _dense_from_conv: Dense {kernel (I, O)[, bias]} ->
    {weight (O, I, 1*rank)[, bias]}."""
    k = np.asarray(dense["kernel"])
    out = {"weight": k.T.reshape(k.shape[1], k.shape[0], *([1] * rank))}
    if "bias" in dense:
        out["bias"] = np.asarray(dense["bias"])
    return out


def export_reference_state_dict(
    params: Dict[str, Any], batch_stats: Dict[str, Any],
    model_config: Dict[str, Any],
) -> Dict[str, np.ndarray]:
    """Our (params, batch_stats) trees -> a reference-layout state_dict.

    Exact inverse of convert_reference_state_dict (roundtrip-tested), so
    models trained HERE load into the reference's torch implementation —
    users can move in either direction. Keys follow the reference modules
    (Video_XProtoNet.py / XProtoNet.py / PPNet: cnn_backbone.backbone.{i}
    wrapper for r2p1d, add_on_layers.{i}, occurrence_module.{i},
    prototype_vectors, last_layer.weight).
    """
    from protoasnet_tpu.models.torch_import import (export_r2plus1d,
                                                    export_resnet2d)

    name = model_config["name"]
    arch = model_config.get("base_architecture", "resnet18")
    video = name == "Video_XProtoNet"
    rank = 3 if video else 2
    sd: Dict[str, np.ndarray] = {}

    backbone_key = "features" if name == "ProtoPNet" else "cnn_backbone"
    if arch == "resnet2p1d_18":
        lln = int(model_config.get("backbone_last_layer_num", -3))
        num_stages = (7 + lln if lln < 0 else lln) - 1
        tv = export_r2plus1d(params["cnn_backbone"],
                             batch_stats["cnn_backbone"],
                             num_stages=num_stages)
        # reference wrapper: Sequential of torchvision children
        # (0=stem, i=layer i) under cnn_backbone.backbone
        for k, v in tv.items():
            head, rest = k.split(".", 1)
            idx = 0 if head == "stem" else int(head[len("layer"):])
            sd[f"cnn_backbone.backbone.{idx}.{rest}"] = v
    else:
        tv = export_resnet2d(params[backbone_key], batch_stats[backbone_key],
                             arch)
        sd.update({f"{backbone_key}.{k}": v for k, v in tv.items()})

    if name in ("XProtoNet", "Video_XProtoNet"):
        sd.update({f"add_on_layers.0.{k}": v for k, v in _conv_from_dense(
            params["add_on_layers"]["Dense_0"], rank).items()})
        sd.update({f"add_on_layers.2.{k}": v for k, v in _conv_from_dense(
            params["add_on_layers"]["Dense_1"], rank).items()})
        for i, idx in ((0, 0), (1, 2), (2, 4)):
            sd.update({f"occurrence_module.{idx}.{k}": v
                       for k, v in _conv_from_dense(
                           params["occurrence_module"][f"Dense_{i}"],
                           rank).items()})
        pv = np.asarray(params["prototype_vectors"])  # (P, D)
        sd["prototype_vectors"] = pv.reshape(*pv.shape, *([1] * rank))
    elif name == "ProtoPNet":
        add_on = params["add_on_layers"]
        # reference Sequential: conv,relu,conv,sigmoid -> indices 0, 2
        for i in range(len(add_on)):
            sd.update({f"add_on_layers.{2 * i}.{k}": v
                       for k, v in _conv_from_dense(
                           add_on[f"Dense_{i}"], 2).items()})
        pv = np.asarray(params["prototype_vectors"])  # (P, kh, kw, D)
        sd["prototype_vectors"] = np.transpose(pv, (0, 3, 1, 2))
    else:
        raise ValueError(f"Unknown model name {name!r}")

    sd["last_layer.weight"] = np.asarray(
        params["last_layer"]["Dense_0"]["kernel"]).T
    # reference models carry a constant all-ones parameter at the
    # prototype shape (ProtoPNet.py:136, Video_XProtoNet.py:73); emit it
    # so strict load_state_dict succeeds
    shape = model_config["prototype_shape"]
    if isinstance(shape, str):
        import ast

        shape = ast.literal_eval(shape)
    sd["ones"] = np.ones(tuple(shape), np.float32)
    return sd


def main(argv=None):
    import argparse

    import torch

    from protoasnet_tpu.utils.config import load_config

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="input checkpoint (.pth reference, or our "
                    ".ckpt with --to_reference)")
    ap.add_argument("out_ckpt", help="output path")
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--to_reference", action="store_true",
                    help="reverse direction: our .ckpt -> reference .pth")
    args = ap.parse_args(argv)

    cfg = load_config(args.config_path)

    if args.to_reference:
        from protoasnet_tpu.utils.io import load_pickle

        blob = load_pickle(args.ckpt)
        sd = export_reference_state_dict(blob["params"], blob["batch_stats"],
                                         cfg["model"])
        torch.save({"epoch": int(blob.get("epoch", 0)),
                    "iteration": int(blob.get("iteration", 0)),
                    "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                                   for k, v in sd.items()},
                    "optimizer": None}, args.out_ckpt)
        logging.info(f"exported {args.ckpt} -> reference-layout "
                     f"{args.out_ckpt}")
        return

    blob = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    params, stats = convert_reference_state_dict(sd, cfg["model"])

    from protoasnet_tpu.utils.io import save_pickle

    save_pickle(
        {"epoch": int(blob.get("epoch", 0)),
         "iteration": int(blob.get("iteration", 0)),
         "params": params, "batch_stats": stats},
        args.out_ckpt,
    )
    logging.info(f"converted {args.ckpt} -> {args.out_ckpt} "
                 f"(load via migrated-params pickle)")


if __name__ == "__main__":
    main()
