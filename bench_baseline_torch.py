"""PyTorch-CPU reference baseline for bench.py.

BASELINE.md requires the reference's clips/sec to be MEASURED (the repo
publishes no numbers). torchvision is not installed here, so this module
hand-builds an architecture-equivalent ProtoASNet-Video in plain torch
(R(2+1)D-18 trunk truncated at layer3 + add-on/occurrence 1x1x1 convs +
cosine prototype head, mirroring /root/reference/src/models/
Video_XProtoNet.py:82-98 and resnet_features.py:307-327) and times the
inference and train steps on CPU.

Run once:  python bench_baseline_torch.py  -> writes BASELINE_MEASURED.json
"""

from __future__ import annotations

import json
import time

import torch
import torch.nn as nn


def midplanes(cin, cout):
    return (cin * cout * 27) // (cin * 9 + 3 * cout)


def conv2plus1d(cin, cout, stride=1):
    mid = midplanes(cin, cout)
    return nn.Sequential(
        nn.Conv3d(cin, mid, (1, 3, 3), stride=(1, stride, stride),
                  padding=(0, 1, 1), bias=False),
        nn.BatchNorm3d(mid),
        nn.ReLU(inplace=True),
        nn.Conv3d(mid, cout, (3, 1, 1), stride=(stride, 1, 1),
                  padding=(1, 0, 0), bias=False),
    )


class Block(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = conv2plus1d(cin, cout, stride)
        self.bn1 = nn.BatchNorm3d(cout)
        self.conv2 = conv2plus1d(cout, cout, 1)
        self.bn2 = nn.BatchNorm3d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv3d(cin, cout, 1, stride=(stride,) * 3, bias=False),
                nn.BatchNorm3d(cout),
            )

    def forward(self, x):
        r = x if self.down is None else self.down(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + r)


class ProtoASNetVideoTorch(nn.Module):
    """R(2+1)D-18[: -3] trunk + ProtoASNet head, P=40, D=256, K=4."""

    def __init__(self, p=40, d=256, k=4):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 45, (1, 7, 7), stride=(1, 2, 2), padding=(0, 3, 3),
                      bias=False),
            nn.BatchNorm3d(45), nn.ReLU(inplace=True),
            nn.Conv3d(45, 64, (3, 1, 1), padding=(1, 0, 0), bias=False),
            nn.BatchNorm3d(64), nn.ReLU(inplace=True),
        )
        self.layer1 = nn.Sequential(Block(64, 64), Block(64, 64))
        self.layer2 = nn.Sequential(Block(64, 128, 2), Block(128, 128))
        self.layer3 = nn.Sequential(Block(128, 256, 2), Block(256, 256))
        self.add_on = nn.Sequential(nn.Conv3d(256, d, 1), nn.ReLU(inplace=True),
                                    nn.Conv3d(d, d, 1))
        self.occ = nn.Sequential(nn.Conv3d(256, d, 1), nn.ReLU(inplace=True),
                                 nn.Conv3d(d, d // 2, 1), nn.ReLU(inplace=True),
                                 nn.Conv3d(d // 2, p, 1, bias=False))
        self.prototypes = nn.Parameter(torch.rand(p, d))
        self.fc = nn.Linear(p, k, bias=False)
        self.cos = nn.CosineSimilarity(dim=2)

    def forward(self, x):
        f = self.layer3(self.layer2(self.layer1(self.stem(x))))
        feat = self.add_on(f).unsqueeze(1)  # (N,1,D,T,H,W)
        occ = torch.abs(self.occ(f)).unsqueeze(2)  # (N,P,1,T,H,W)
        roi = (occ * feat).sum(dim=(3, 4, 5))  # (N,P,D)
        sim = (self.cos(roi, self.prototypes.unsqueeze(0)) + 1) / 2
        return self.fc(sim), sim, occ


def measure(batch=2, frames=32, size=112, iters=3, train=False):
    torch.manual_seed(0)
    model = ProtoASNetVideoTorch()
    model.train(train)
    x = torch.randn(batch, 3, frames, size, size)
    y = torch.randint(0, 3, (batch,))
    opt = torch.optim.Adam(model.parameters(), lr=1e-4) if train else None

    def step():
        if train:
            opt.zero_grad()
            logits, sim, occ = model(x)
            loss = nn.functional.cross_entropy(logits, y)
            loss.backward()
            opt.step()
        else:
            with torch.no_grad():
                model(x)

    step()  # warmup
    t0 = time.time()
    for _ in range(iters):
        step()
    dt = time.time() - t0
    return batch * iters / dt


if __name__ == "__main__":
    print("measuring torch-CPU ProtoASNet-Video baseline (this is slow)...")
    infer = measure(train=False)
    print(f"inference: {infer:.4f} clips/s")
    train = measure(train=True, iters=2)
    print(f"train: {train:.4f} clips/s")
    with open("BASELINE_MEASURED.json", "w") as f:
        json.dump(
            {
                "torch_cpu_infer_clips_per_sec": infer,
                "torch_cpu_train_clips_per_sec": train,
                "config": "ProtoASNet-Video R(2+1)D-18[-3], 40x256 protos, "
                          "32x112x112 clips",
                "threads": torch.get_num_threads(),
            },
            f, indent=2,
        )
    print("wrote BASELINE_MEASURED.json")
