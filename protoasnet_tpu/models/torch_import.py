"""Import torchvision-format pretrained weights into the flax models.

The reference downloads torchvision zoo checkpoints into
./pretrained_models and loads them minus the fc head
(/root/reference/src/models/resnet_features.py:18,237-327). This module
converts those state dicts (torchvision key layout) into our channels-last
flax param/batch_stats trees:

* conv weight (O, I, *k) -> kernel (*k, I, O)
* bn weight/bias/running_mean/running_var -> scale/bias + batch_stats

This environment has zero egress, so weights are only loaded when a local
file exists (PROTOASNET_PRETRAINED_DIR or ./pretrained_models); otherwise
models keep their kaiming init with a warning — training still runs.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = ["convert_resnet2d", "convert_r2plus1d", "load_pretrained_backbone",
           "export_resnet2d", "export_r2plus1d"]

from protoasnet_tpu.models.backbones.resnet2d import RESNET_SPECS, Bottleneck


def _conv(w) -> np.ndarray:
    w = np.asarray(w)
    # (O, I, *k) -> (*k, I, O)
    return np.transpose(w, tuple(range(2, w.ndim)) + (1, 0))


def _bn(sd, prefix) -> Tuple[Dict, Dict]:
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_resnet2d(sd: Dict[str, Any], variant: str = "resnet18"
                     ) -> Tuple[Dict, Dict]:
    """torchvision resnet state dict -> (params, batch_stats) trees matching
    ResNetFeatures' module names."""
    block_cls, stage_sizes = RESNET_SPECS[variant]
    bottleneck = block_cls is Bottleneck
    params: Dict[str, Any] = {"conv1": {"kernel": _conv(sd["conv1.weight"])}}
    stats: Dict[str, Any] = {}
    p, s = _bn(sd, "bn1")
    params["bn1"], stats["bn1"] = p, s
    n_convs = 3 if bottleneck else 2
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t = f"layer{i + 1}.{j}"
            f = f"layer{i + 1}_{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in range(n_convs):
                bp[f"Conv_{c}"] = {"kernel": _conv(sd[f"{t}.conv{c + 1}.weight"])}
                bnp, bns = _bn(sd, f"{t}.bn{c + 1}")
                bp[f"BatchNorm_{c}"] = bnp
                bs[f"BatchNorm_{c}"] = bns
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                bnp, bns = _bn(sd, f"{t}.downsample.1")
                bp["downsample_bn"] = bnp
                bs["downsample_bn"] = bns
            params[f] = bp
            stats[f] = bs
    return params, stats


def convert_r2plus1d(sd: Dict[str, Any], num_stages: int = 3
                     ) -> Tuple[Dict, Dict]:
    """torchvision r2plus1d_18 state dict -> trees matching R2Plus1D18."""
    params: Dict[str, Any] = {
        "stem_spatial": {"kernel": _conv(sd["stem.0.weight"])},
        "stem_temporal": {"kernel": _conv(sd["stem.3.weight"])},
    }
    stats: Dict[str, Any] = {}
    p, s = _bn(sd, "stem.1")
    params["stem_bn1"], stats["stem_bn1"] = p, s
    p, s = _bn(sd, "stem.4")
    params["stem_bn2"], stats["stem_bn2"] = p, s

    for i in range(num_stages):
        for j in range(2):
            t = f"layer{i + 1}.{j}"
            f = f"layer{i + 1}_{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in (1, 2):
                conv = {
                    "spatial": {"kernel": _conv(sd[f"{t}.conv{c}.0.0.weight"])},
                    "temporal": {"kernel": _conv(sd[f"{t}.conv{c}.0.3.weight"])},
                }
                bnp, bns = _bn(sd, f"{t}.conv{c}.0.1")
                conv["bn_mid"] = bnp
                bp[f"conv{c}"] = conv
                bs[f"conv{c}"] = {"bn_mid": bns}
                bnp, bns = _bn(sd, f"{t}.conv{c}.1")
                bp[f"bn{c}"] = bnp
                bs[f"bn{c}"] = bns
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                bnp, bns = _bn(sd, f"{t}.downsample.1")
                bp["downsample_bn"] = bnp
                bs["downsample_bn"] = bns
            params[f] = bp
            stats[f] = bs
    return params, stats


def _conv_inv(kernel) -> np.ndarray:
    """kernel (*k, I, O) -> torch conv weight (O, I, *k)."""
    k = np.asarray(kernel)
    nd = k.ndim
    return np.transpose(k, (nd - 1, nd - 2) + tuple(range(nd - 2)))


def _bn_inv(p: Dict, s: Dict, prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(s["mean"])
    out[f"{prefix}.running_var"] = np.asarray(s["var"])
    # torch state dicts carry this; strict load_state_dict expects it
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_resnet2d(params: Dict, stats: Dict, variant: str = "resnet18"
                    ) -> Dict[str, np.ndarray]:
    """Inverse of convert_resnet2d: flax trees -> torchvision resnet keys."""
    block_cls, stage_sizes = RESNET_SPECS[variant]
    n_convs = 3 if block_cls is Bottleneck else 2
    sd: Dict[str, np.ndarray] = {
        "conv1.weight": _conv_inv(params["conv1"]["kernel"])}
    _bn_inv(params["bn1"], stats["bn1"], "bn1", sd)
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t, f = f"layer{i + 1}.{j}", f"layer{i + 1}_{j}"
            bp, bs = params[f], stats[f]
            for c in range(n_convs):
                sd[f"{t}.conv{c + 1}.weight"] = _conv_inv(
                    bp[f"Conv_{c}"]["kernel"])
                _bn_inv(bp[f"BatchNorm_{c}"], bs[f"BatchNorm_{c}"],
                        f"{t}.bn{c + 1}", sd)
            if "downsample_conv" in bp:
                sd[f"{t}.downsample.0.weight"] = _conv_inv(
                    bp["downsample_conv"]["kernel"])
                _bn_inv(bp["downsample_bn"], bs["downsample_bn"],
                        f"{t}.downsample.1", sd)
    return sd


def export_r2plus1d(params: Dict, stats: Dict, num_stages: int = 3
                    ) -> Dict[str, np.ndarray]:
    """Inverse of convert_r2plus1d: flax trees -> torchvision r2plus1d_18
    keys (the custom space-to-depth stem stores the exact same kernel an
    nn.Conv would, so export is layout-only)."""
    sd: Dict[str, np.ndarray] = {
        "stem.0.weight": _conv_inv(params["stem_spatial"]["kernel"]),
        "stem.3.weight": _conv_inv(params["stem_temporal"]["kernel"]),
    }
    _bn_inv(params["stem_bn1"], stats["stem_bn1"], "stem.1", sd)
    _bn_inv(params["stem_bn2"], stats["stem_bn2"], "stem.4", sd)
    for i in range(num_stages):
        for j in range(2):
            t, f = f"layer{i + 1}.{j}", f"layer{i + 1}_{j}"
            bp, bs = params[f], stats[f]
            for c in (1, 2):
                sd[f"{t}.conv{c}.0.0.weight"] = _conv_inv(
                    bp[f"conv{c}"]["spatial"]["kernel"])
                _bn_inv(bp[f"conv{c}"]["bn_mid"], bs[f"conv{c}"]["bn_mid"],
                        f"{t}.conv{c}.0.1", sd)
                sd[f"{t}.conv{c}.0.3.weight"] = _conv_inv(
                    bp[f"conv{c}"]["temporal"]["kernel"])
                _bn_inv(bp[f"bn{c}"], bs[f"bn{c}"], f"{t}.conv{c}.1", sd)
            if "downsample_conv" in bp:
                sd[f"{t}.downsample.0.weight"] = _conv_inv(
                    bp["downsample_conv"]["kernel"])
                _bn_inv(bp["downsample_bn"], bs["downsample_bn"],
                        f"{t}.downsample.1", sd)
    return sd


def convert_r3d(sd: Dict[str, Any], num_stages: int = 3) -> Tuple[Dict, Dict]:
    """torchvision r3d_18 state dict (VideoResNet with Conv3DSimple blocks:
    stem.0/1, layerX.Y.conv{1,2}.0 + .1, downsample.0/1) -> R3D18 trees."""
    params: Dict[str, Any] = {
        "stem_conv": {"kernel": _conv(sd["stem.0.weight"])}}
    stats: Dict[str, Any] = {}
    p, s = _bn(sd, "stem.1")
    params["stem_bn"], stats["stem_bn"] = p, s
    for i in range(num_stages):
        for j in range(2):
            t = f"layer{i + 1}.{j}"
            f = f"layer{i + 1}_{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in (1, 2):
                bp[f"conv{c}"] = {"kernel": _conv(sd[f"{t}.conv{c}.0.weight"])}
                bnp, bns = _bn(sd, f"{t}.conv{c}.1")
                bp[f"bn{c}"] = bnp
                bs[f"bn{c}"] = bns
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                bnp, bns = _bn(sd, f"{t}.downsample.1")
                bp["downsample_bn"] = bnp
                bs["downsample_bn"] = bns
            params[f] = bp
            stats[f] = bs
    return params, stats


def convert_vgg(sd: Dict[str, Any], variant: str = "vgg16") -> Tuple[Dict, Dict]:
    """torchvision vgg*(_bn) features state dict -> (params, batch_stats)
    matching VGGFeatures (keys features.{i}.weight over the Sequential)."""
    from protoasnet_tpu.models.backbones.vgg import VGG_CFGS

    cfg = VGG_CFGS[variant.replace("_bn", "")]
    bn = variant.endswith("_bn")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    seq = 0  # torchvision Sequential index
    conv_idx = 0
    for v in cfg:
        if v == "M":
            seq += 1
            continue
        conv = {"kernel": _conv(sd[f"features.{seq}.weight"])}
        if not bn:
            conv["bias"] = np.asarray(sd[f"features.{seq}.bias"])
        params[f"conv{conv_idx}"] = conv
        seq += 1
        if bn:
            bnp, bns = _bn(sd, f"features.{seq}")
            params[f"bn{conv_idx}"] = bnp
            stats[f"bn{conv_idx}"] = bns
            seq += 1
        seq += 1  # ReLU
        conv_idx += 1
    return params, stats


def convert_densenet(sd: Dict[str, Any], variant: str = "densenet121"
                     ) -> Tuple[Dict, Dict]:
    """torchvision densenet features state dict -> trees matching
    DenseNetFeatures."""
    from protoasnet_tpu.models.backbones.densenet import DENSENET_SPECS

    _, _, blocks = DENSENET_SPECS[variant]
    params: Dict[str, Any] = {
        "conv0": {"kernel": _conv(sd["features.conv0.weight"])}}
    stats: Dict[str, Any] = {}
    p, s = _bn(sd, "features.norm0")
    params["norm0"], stats["norm0"] = p, s
    for i, n_layers in enumerate(blocks):
        for j in range(n_layers):
            t = f"features.denseblock{i + 1}.denselayer{j + 1}"
            f = f"denseblock{i + 1}_layer{j + 1}"
            lp: Dict[str, Any] = {}
            ls: Dict[str, Any] = {}
            for c in (1, 2):
                bnp, bns = _bn(sd, f"{t}.norm{c}")
                lp[f"norm{c}"] = bnp
                ls[f"norm{c}"] = bns
                lp[f"conv{c}"] = {"kernel": _conv(sd[f"{t}.conv{c}.weight"])}
            params[f] = lp
            stats[f] = ls
        if i != len(blocks) - 1:
            t = f"features.transition{i + 1}"
            f = f"transition{i + 1}"
            bnp, bns = _bn(sd, f"{t}.norm")
            params[f] = {"norm": bnp,
                         "conv": {"kernel": _conv(sd[f"{t}.conv.weight"])}}
            stats[f] = {"norm": bns}
    p, s = _bn(sd, "features.norm5")
    params["norm5"], stats["norm5"] = p, s
    return params, stats


def _find_weights(arch: str) -> Optional[str]:
    roots = [os.environ.get("PROTOASNET_PRETRAINED_DIR", ""),
             "pretrained_models", os.path.expanduser("~/pretrained_models")]
    names = [f"{arch}.pth", f"{arch}.pt", f"{arch}-weights.pth"]
    for root in roots:
        if not root:
            continue
        for n in names:
            p = os.path.join(root, n)
            if os.path.exists(p):
                return p
        if os.path.isdir(root):
            for f in os.listdir(root):
                if f.startswith(arch) and f.endswith((".pth", ".pt")):
                    return os.path.join(root, f)
    return None


def load_pretrained_backbone(params, batch_stats, model_config: Dict[str, Any]):
    """Merge local torchvision weights into (params, batch_stats) for the
    model's backbone submodule. Returns updated trees (copies)."""
    arch = model_config.get("base_architecture", "resnet18")
    path = _find_weights(arch)
    if path is None:
        logging.warning(
            f"pretrained=True but no local weights for {arch!r} "
            f"(set PROTOASNET_PRETRAINED_DIR); keeping random init"
        )
        return params, batch_stats

    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    if arch == "resnet2p1d_18":
        lln = int(model_config.get("backbone_last_layer_num", -3))
        num_stages = (7 + lln if lln < 0 else lln) - 1
        bp, bs = convert_r2plus1d(sd, num_stages=num_stages)
        sub = "cnn_backbone"
    elif arch == "r3d_18":
        lln = int(model_config.get("backbone_last_layer_num", -3))
        num_stages = (7 + lln if lln < 0 else lln) - 1
        bp, bs = convert_r3d(sd, num_stages=num_stages)
        sub = "cnn_backbone"
    elif arch in RESNET_SPECS:
        bp, bs = convert_resnet2d(sd, arch)
        sub = "cnn_backbone" if "cnn_backbone" in params else "features"
    elif arch.replace("_bn", "").startswith("vgg"):
        bp, bs = convert_vgg(sd, arch)
        sub = "cnn_backbone" if "cnn_backbone" in params else "features"
    elif arch.startswith("densenet"):
        bp, bs = convert_densenet(sd, arch)
        sub = "cnn_backbone" if "cnn_backbone" in params else "features"
    else:
        logging.warning(f"no torch importer for {arch!r}; keeping random init")
        return params, batch_stats

    import jax

    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if k in out and isinstance(v, dict) and isinstance(out[k], dict):
                out[k] = merge(out[k], v)
            else:
                out[k] = v
        return out

    new_params = dict(params)
    new_params[sub] = merge(params[sub], bp)
    new_stats = dict(batch_stats)
    new_stats[sub] = merge(batch_stats.get(sub, {}), bs)

    # shape check against the randomly-initialized tree
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, params[sub])
    new_shapes = jax.tree_util.tree_map(lambda x: np.asarray(x).shape,
                                        new_params[sub])
    if ref_shapes != new_shapes:
        raise ValueError(f"pretrained weight shapes do not match model for {arch}")
    logging.info(f"loaded pretrained {arch} weights from {path}")
    return new_params, new_stats
