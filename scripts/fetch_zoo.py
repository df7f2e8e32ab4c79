#!/usr/bin/env python
"""Fetch the torchvision pretrained-backbone zoo into a local weights dir.

The reference auto-downloads torchvision checkpoints at model-build time
(`/root/reference/src/models/resnet_features.py:18,237-248,307-327`); this
framework's build hosts have zero egress, so acquisition is an explicit,
run-anywhere-with-egress step instead:

    python scripts/fetch_zoo.py --dest ./pretrained_models          # all
    python scripts/fetch_zoo.py --dest ... resnet18 resnet2p1d_18   # some
    PROTOASNET_PRETRAINED_DIR=./pretrained_models python main.py ...

Files land as ``{arch}.pth`` — exactly what
``protoasnet_tpu.models.torch_import._find_weights`` looks for — and every
download is verified against the sha256 prefix torch.hub embeds in the
upstream filename (``resnet18-f37072fd.pth`` == sha256 starts f37072fd).
A wrong or bit-rotted URL therefore fails loudly; nothing unverified is
ever written to the destination name.

Offline alternative: on any machine with torchvision installed, its own
cache (``~/.cache/torch/hub/checkpoints``) already holds these files under
the hash-suffixed names — copy them in with ``--import-cache``.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import sys
import tempfile
import urllib.request

BASE = "https://download.pytorch.org/models/"

# arch (our _find_weights name) -> upstream hash-suffixed filename.
# torch.hub convention: the 8 hex chars before .pth are sha256[:8] of the
# file, which fetch() verifies after download. URL set matches the zoo the
# importers cover (torch_import.py; reference resnet_features.py zoo).
ZOO = {
    "resnet18": "resnet18-f37072fd.pth",
    "resnet34": "resnet34-b627a593.pth",
    "resnet50": "resnet50-0676ba61.pth",
    "resnet101": "resnet101-63fe2227.pth",
    "resnet152": "resnet152-394f9c45.pth",
    "vgg11": "vgg11-8a719046.pth",
    "vgg13": "vgg13-19584684.pth",
    "vgg16": "vgg16-397923af.pth",
    "vgg19": "vgg19-dcbb9e9d.pth",
    "vgg11_bn": "vgg11_bn-6002323d.pth",
    "vgg13_bn": "vgg13_bn-abd245e5.pth",
    "vgg16_bn": "vgg16_bn-6c64b313.pth",
    "vgg19_bn": "vgg19_bn-c79401a0.pth",
    "densenet121": "densenet121-a639ec97.pth",
    "densenet161": "densenet161-8d451a50.pth",
    "densenet169": "densenet169-b2777c0a.pth",
    "densenet201": "densenet201-c1103571.pth",
    # video backbones (torchvision.models.video)
    "resnet2p1d_18": "r2plus1d_18-91a641e6.pth",
    "r3d_18": "r3d_18-b3b3357e.pth",
}


def _expected_prefix(upstream_name: str) -> str:
    stem = upstream_name.rsplit(".", 1)[0]
    return stem.rsplit("-", 1)[1]


def fetch(arch: str, dest_dir: str, timeout: float = 600.0) -> str:
    """Download + sha256-verify one checkpoint; returns the final path."""
    upstream = ZOO[arch]
    want = _expected_prefix(upstream)
    final = os.path.join(dest_dir, f"{arch}.pth")
    if os.path.exists(final):
        got = _sha256(final)
        if got.startswith(want):
            print(f"  {arch}: already present, sha256 ok ({got[:8]})")
            return final
        raise SystemExit(
            f"  {arch}: existing {final} sha256 {got[:8]} != expected "
            f"{want} — refusing to overwrite; delete it and rerun")
    url = BASE + upstream
    print(f"  {arch}: {url}")
    fd, tmp = tempfile.mkstemp(dir=dest_dir, suffix=".part")
    os.close(fd)
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                open(tmp, "wb") as f:
            shutil.copyfileobj(r, f, 1 << 20)
        got = _sha256(tmp)
        if not got.startswith(want):
            raise SystemExit(
                f"  {arch}: downloaded sha256 {got[:8]} != expected {want} "
                f"(corrupt download or upstream changed) — aborting")
        os.replace(tmp, final)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    print(f"  {arch}: ok ({got[:8]}, {os.path.getsize(final) >> 20} MiB)")
    return final


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def import_cache(dest_dir: str, cache_dir: str) -> int:
    """Copy hash-suffixed files from a torch.hub cache into dest (verified)."""
    n = 0
    for arch, upstream in ZOO.items():
        src = os.path.join(cache_dir, upstream)
        final = os.path.join(dest_dir, f"{arch}.pth")
        if not os.path.exists(src) or os.path.exists(final):
            continue
        got = _sha256(src)
        if not got.startswith(_expected_prefix(upstream)):
            print(f"  {arch}: cache file {src} fails sha256 — skipped")
            continue
        shutil.copyfile(src, final)
        print(f"  {arch}: imported from cache ({got[:8]})")
        n += 1
    return n


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("archs", nargs="*", default=[],
                    help=f"subset to fetch (default: all). "
                         f"Known: {' '.join(sorted(ZOO))}")
    ap.add_argument("--dest", default=os.environ.get(
        "PROTOASNET_PRETRAINED_DIR", "pretrained_models"))
    ap.add_argument("--import-cache", metavar="DIR", default=None,
                    help="instead of downloading, copy verified files from "
                         "a torch.hub checkpoint cache "
                         "(~/.cache/torch/hub/checkpoints)")
    a = ap.parse_args(argv)

    unknown = [x for x in a.archs if x not in ZOO]
    if unknown:
        raise SystemExit(f"unknown arch(s) {unknown}; known: {sorted(ZOO)}")
    os.makedirs(a.dest, exist_ok=True)
    if a.import_cache:
        n = import_cache(a.dest, os.path.expanduser(a.import_cache))
        print(f"imported {n} checkpoint(s) into {a.dest}")
        return
    archs = a.archs or sorted(ZOO)
    print(f"fetching {len(archs)} checkpoint(s) into {a.dest}")
    for arch in archs:
        fetch(arch, a.dest)
    print(f"done — export PROTOASNET_PRETRAINED_DIR={os.path.abspath(a.dest)}")


if __name__ == "__main__":
    sys.exit(main())
