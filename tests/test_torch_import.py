"""Golden backbone parity: torchvision-format weights imported into the
flax trunks must reproduce the torch forward at fp32 tolerance
(SURVEY.md §7 step 2 requirement)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from protoasnet_tpu.models.backbones.r2plus1d import R2Plus1D18, midplanes
from protoasnet_tpu.models.backbones.resnet2d import resnet_features
from protoasnet_tpu.models.torch_import import convert_r2plus1d, convert_resnet2d


# ---- torchvision-layout torch models (built here: torchvision not installed)

class TVBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + r)


class TVResNet18Features(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, n in enumerate([2, 2, 2, 2]):
            blocks = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(TVBasicBlock(cin, 64 * 2**i, stride))
                cin = 64 * 2**i
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def tv_conv2plus1d(cin, cout, stride=1):
    mid = midplanes(cin, cout)
    return nn.Sequential(
        nn.Conv3d(cin, mid, (1, 3, 3), (1, stride, stride), (0, 1, 1), bias=False),
        nn.BatchNorm3d(mid),
        nn.ReLU(),
        nn.Conv3d(mid, cout, (3, 1, 1), (stride, 1, 1), (1, 0, 0), bias=False),
    )


class TVVideoBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Sequential(tv_conv2plus1d(cin, cout, stride),
                                   nn.BatchNorm3d(cout), nn.ReLU())
        self.conv2 = nn.Sequential(tv_conv2plus1d(cout, cout),
                                   nn.BatchNorm3d(cout))
        self.relu = nn.ReLU()
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, cout, 1, (stride,) * 3, bias=False),
                nn.BatchNorm3d(cout),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        return self.relu(self.conv2(self.conv1(x)) + r)


class TVR2Plus1D(nn.Module):
    def __init__(self, num_stages=3):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 45, (1, 7, 7), (1, 2, 2), (0, 3, 3), bias=False),
            nn.BatchNorm3d(45), nn.ReLU(),
            nn.Conv3d(45, 64, (3, 1, 1), 1, (1, 0, 0), bias=False),
            nn.BatchNorm3d(64), nn.ReLU(),
        )
        cin = 64
        for i in range(num_stages):
            blocks = []
            for j in range(2):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(TVVideoBlock(cin, 64 * 2**i, stride))
                cin = 64 * 2**i
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
        self.num_stages = num_stages

    def forward(self, x):
        x = self.stem(x)
        for i in range(self.num_stages):
            x = getattr(self, f"layer{i + 1}")(x)
        return x


def test_resnet18_import_forward_parity():
    torch.manual_seed(0)
    tv = TVResNet18Features().eval()
    sd = {k: v.numpy() for k, v in tv.state_dict().items()}
    params, stats = convert_resnet2d(sd, "resnet18")

    model = resnet_features("resnet18")
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    # template init to validate structure, then substitute imported weights
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert jax.tree_util.tree_structure(variables["params"]) == \
        jax.tree_util.tree_structure(jax.tree_util.tree_map(jnp.asarray, params))
    out = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    with torch.no_grad():
        ref = tv(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_r2plus1d_import_forward_parity():
    torch.manual_seed(1)
    tv = TVR2Plus1D(num_stages=3).eval()
    sd = {k: v.numpy() for k, v in tv.state_dict().items()}
    params, stats = convert_r2plus1d(sd, num_stages=3)

    model = R2Plus1D18(last_layer_num=-3)
    x = np.random.default_rng(1).normal(size=(1, 8, 32, 32, 3)).astype(np.float32)
    out = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    with torch.no_grad():
        ref = tv(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 4, 1))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_load_pretrained_backbone_from_file(tmp_path, monkeypatch):
    """End-to-end: a .pth on disk is found, converted, and merged."""
    torch.manual_seed(2)
    tv = TVR2Plus1D(num_stages=3)
    path = tmp_path / "resnet2p1d_18.pth"
    torch.save(tv.state_dict(), str(path))
    monkeypatch.setenv("PROTOASNET_PRETRAINED_DIR", str(tmp_path))

    from protoasnet_tpu.models.builder import build_model, init_model
    from protoasnet_tpu.models.torch_import import load_pretrained_backbone

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3, "prototype_shape": (8, 64, 1, 1, 1),
           "num_classes": 4, "img_size": 32, "pretrained": True}
    model = build_model(cfg)
    params, stats = init_model(model, jnp.zeros((1, 8, 32, 32, 3)), seed=0)
    new_params, new_stats = load_pretrained_backbone(params, stats, cfg)
    want = tv.state_dict()["stem.0.weight"].numpy()
    got = np.asarray(new_params["cnn_backbone"]["stem_spatial"]["kernel"])
    np.testing.assert_allclose(got, np.transpose(want, (2, 3, 4, 1, 0)))
    # non-backbone params untouched
    np.testing.assert_allclose(
        np.asarray(new_params["prototype_vectors"]),
        np.asarray(params["prototype_vectors"]))


class TVVGG(nn.Module):
    """torchvision-layout VGG features (Sequential under .features)."""

    def __init__(self, cfg, bn=False):
        super().__init__()
        layers = []
        cin = 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(cin, v, 3, padding=1, bias=not bn))
                if bn:
                    layers.append(nn.BatchNorm2d(v))
                layers.append(nn.ReLU())
                cin = v
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        return self.features(x)


import pytest


@pytest.mark.parametrize("variant", ["vgg11", "vgg11_bn"])
def test_vgg_import_forward_parity(variant):
    from protoasnet_tpu.models.backbones.vgg import VGG_CFGS, VGGFeatures
    from protoasnet_tpu.models.torch_import import convert_vgg

    torch.manual_seed(3)
    tv = TVVGG(VGG_CFGS["vgg11"], bn=variant.endswith("_bn")).eval()
    sd = {k: v.numpy() for k, v in tv.state_dict().items()}
    params, stats = convert_vgg(sd, variant)
    model = VGGFeatures(variant=variant)
    x = np.random.default_rng(3).normal(size=(1, 32, 32, 3)).astype(np.float32)
    out = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    with torch.no_grad():
        ref = tv(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


class TVDenseLayer(nn.Module):
    def __init__(self, cin, growth, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)
        self.relu = nn.ReLU()

    def forward(self, x):
        y = self.conv1(self.relu(self.norm1(x)))
        y = self.conv2(self.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


@pytest.mark.slow
def test_densenet_import_forward_parity():
    """Golden vs a torchvision-layout densenet121 features trunk.

    slow-marked: the densenet compile + torch twin costs ~25 s on this
    1-core host; the full suite always runs it."""
    from protoasnet_tpu.models.backbones.densenet import (
        DENSENET_SPECS,
        DenseNetFeatures,
    )
    from protoasnet_tpu.models.torch_import import convert_densenet

    torch.manual_seed(4)
    init_f, growth, blocks = DENSENET_SPECS["densenet121"]

    feats = nn.Module()
    feats.conv0 = nn.Conv2d(3, init_f, 7, 2, 3, bias=False)
    feats.norm0 = nn.BatchNorm2d(init_f)
    c = init_f
    for i, n in enumerate(blocks):
        block = nn.Module()
        for j in range(n):
            setattr(block, f"denselayer{j + 1}", TVDenseLayer(c + j * growth, growth))
        setattr(feats, f"denseblock{i + 1}", block)
        c += n * growth
        if i != len(blocks) - 1:
            tr = nn.Module()
            tr.norm = nn.BatchNorm2d(c)
            tr.conv = nn.Conv2d(c, c // 2, 1, bias=False)
            setattr(feats, f"transition{i + 1}", tr)
            c //= 2
    feats.norm5 = nn.BatchNorm2d(c)

    root = nn.Module()
    root.features = feats
    root.eval()
    sd = {k: v.numpy() for k, v in root.state_dict().items()}
    params, stats = convert_densenet(sd, "densenet121")

    def torch_forward(x):
        relu, pool = nn.functional.relu, nn.functional
        y = relu(feats.norm0(feats.conv0(x)))
        y = nn.functional.max_pool2d(y, 3, 2, 1)
        for i in range(len(blocks)):
            block = getattr(feats, f"denseblock{i + 1}")
            for j in range(blocks[i]):
                y = getattr(block, f"denselayer{j + 1}")(y)
            if i != len(blocks) - 1:
                tr = getattr(feats, f"transition{i + 1}")
                y = nn.functional.avg_pool2d(tr.conv(relu(tr.norm(y))), 2, 2)
        return relu(feats.norm5(y))

    model = DenseNetFeatures(variant="densenet121")
    x = np.random.default_rng(4).normal(size=(1, 32, 32, 3)).astype(np.float32)
    out = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    with torch.no_grad():
        ref = torch_forward(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=1e-3)


class TVR3DBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv3d(cin, cout, 3, (stride,) * 3, 1, bias=False),
            nn.BatchNorm3d(cout), nn.ReLU())
        self.conv2 = nn.Sequential(
            nn.Conv3d(cout, cout, 3, 1, 1, bias=False), nn.BatchNorm3d(cout))
        self.relu = nn.ReLU()
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, cout, 1, (stride,) * 3, bias=False),
                nn.BatchNorm3d(cout))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        return self.relu(self.conv2(self.conv1(x)) + r)


class TVR3D(nn.Module):
    def __init__(self, num_stages=3):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 64, (3, 7, 7), (1, 2, 2), (1, 3, 3), bias=False),
            nn.BatchNorm3d(64), nn.ReLU())
        cin = 64
        for i in range(num_stages):
            blocks = []
            for j in range(2):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(TVR3DBlock(cin, 64 * 2**i, stride))
                cin = 64 * 2**i
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
        self.num_stages = num_stages

    def forward(self, x):
        x = self.stem(x)
        for i in range(self.num_stages):
            x = getattr(self, f"layer{i + 1}")(x)
        return x


def test_r3d18_import_forward_parity():
    from protoasnet_tpu.models.backbones.r3d import R3D18
    from protoasnet_tpu.models.torch_import import convert_r3d

    torch.manual_seed(5)
    tv = TVR3D(num_stages=3).eval()
    sd = {k: v.numpy() for k, v in tv.state_dict().items()}
    params, stats = convert_r3d(sd, num_stages=3)
    model = R3D18(last_layer_num=-3)
    x = np.random.default_rng(5).normal(size=(1, 8, 32, 32, 3)).astype(np.float32)
    out = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    with torch.no_grad():
        ref = tv(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 4, 1))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


# -- scripts/fetch_zoo.py (hermetic: verification logic only, no network) ----


def _load_fetch_zoo():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "fetch_zoo.py")
    spec = importlib.util.spec_from_file_location("fetch_zoo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fetch_zoo_covers_every_importable_arch():
    """The fetch manifest must track the importer zoo: every arch
    load_pretrained_backbone can convert has a URL, and every URL's
    embedded sha256 prefix is well-formed (8 hex chars, the torch.hub
    convention the downloader verifies against)."""
    fz = _load_fetch_zoo()
    from protoasnet_tpu.models.backbones.resnet2d import RESNET_SPECS

    for arch in list(RESNET_SPECS) + [
            "resnet2p1d_18", "r3d_18",
            "densenet121", "densenet161", "densenet169", "densenet201",
            "vgg11", "vgg13", "vgg16", "vgg19",
            "vgg11_bn", "vgg13_bn", "vgg16_bn", "vgg19_bn"]:
        assert arch in fz.ZOO, f"no fetch URL for importable arch {arch}"
    for arch, upstream in fz.ZOO.items():
        pref = fz._expected_prefix(upstream)
        assert len(pref) == 8 and int(pref, 16) >= 0, (arch, upstream)


def test_fetch_zoo_verifies_and_imports_cache(tmp_path):
    """import_cache copies only files whose sha256 matches the embedded
    prefix; fetch() refuses to overwrite a mismatched existing file."""
    import hashlib

    import pytest

    fz = _load_fetch_zoo()
    cache = tmp_path / "cache"
    dest = tmp_path / "dest"
    cache.mkdir(), dest.mkdir()

    # forge a tiny ZOO whose hash prefixes we control
    good = b"good-weights"
    bad = b"tampered"
    fz.ZOO = {
        "archA": f"archA-{hashlib.sha256(good).hexdigest()[:8]}.pth",
        "archB": f"archB-{hashlib.sha256(good).hexdigest()[:8]}.pth",
    }
    (cache / fz.ZOO["archA"]).write_bytes(good)
    (cache / fz.ZOO["archB"]).write_bytes(bad)  # wrong content
    n = fz.import_cache(str(dest), str(cache))
    assert n == 1
    assert (dest / "archA.pth").read_bytes() == good
    assert not (dest / "archB.pth").exists()

    # fetch(): existing-but-corrupt file is a hard error, not silent reuse
    (dest / "archB.pth").write_bytes(bad)
    with pytest.raises(SystemExit, match="refusing to overwrite"):
        fz.fetch("archB", str(dest))
    # existing-and-valid short-circuits without any network touch
    assert fz.fetch("archA", str(dest)) == str(dest / "archA.pth")
