"""Direct goldens for the diversity metric (EpochMetrics count_array path).

Reference semantics (Video_XProtoNet_e2e.py:163-171, 274-279): count how
often each prototype lands in the top-5 (class protos) / top-2 (abstain
protos) similarity ranks, then report #prototypes whose count is STRICTLY
greater than 0.05 * n_samples. The reference hard-codes the class/abstain
split at 30; ours derives it from the prototype/class layout (SURVEY.md
known-bugs) — these tests pin the split boundary, the strict-> threshold,
and the exact counts, the failure modes an agent-level integration run
would never catch.
"""

from __future__ import annotations

import numpy as np

from protoasnet_tpu.train.metrics import EpochMetrics

P, NC = 40, 4  # 40 prototypes, 4 logits (3 classes + abstain) -> split at 30


def make_metrics(abstain=True, num_protos=P, num_classes=NC):
    return EpochMetrics(num_classes=num_classes, abstain_class=abstain,
                        num_prototypes=num_protos)


def base_sims(n):
    """Distinct, small, decreasing background similarities (no rank ties)."""
    return np.linspace(1.0, 0.01, P)[None, :].repeat(n, axis=0).copy()


def test_diversity_exact_counts_and_strict_threshold():
    n = 20
    sims = base_sims(n)
    # class part: protos 0..4 dominate every sample's top-5 ...
    sims[:, :5] = np.array([10.0, 9.0, 8.0, 7.0, 6.0])
    # ... except sample 0, where proto 5 displaces proto 4
    sims[0, 5] = 6.5
    sims[0, 4] = 0.001
    # abstain part: protos 30, 31 are every sample's top-2; 32 once
    sims[:, 30] = 20.0
    sims[:, 31] = 19.0
    sims[0, 32] = 19.5
    sims[0, 31] = 0.002

    m = make_metrics()
    logits = np.zeros((n, NC), np.float32)
    target = np.zeros(n, np.int64)
    m.update(logits[:10], target[:10], similarities=sims[:10])
    m.update(logits[10:], target[10:], similarities=sims[10:])

    # exact per-prototype counts
    assert m.count_array[0] == n and m.count_array[3] == n
    assert m.count_array[4] == n - 1
    assert m.count_array[5] == 1
    assert m.count_array[6:30].sum() == 0
    assert m.count_array[30] == n
    assert m.count_array[31] == n - 1
    assert m.count_array[32] == 1
    assert m.count_array[33:].sum() == 0

    out = m.compute()
    # threshold is STRICT >: 0.05 * 20 = 1.0, so proto 5's count of exactly
    # 1 must NOT be counted (the > vs >= failure mode)
    assert out["diversity"] == 5
    # abstain side: 30 (20 hits) and 31 (19) counted, 32 (exactly 1) not
    assert out["diversity_abstain"] == 2


def test_split_boundary_no_leak():
    """A huge similarity at proto 29 (last class proto) must count on the
    class side only, and proto 30 (first abstain proto) on the abstain side
    only — the reference's hard-coded-30 split is exactly where an
    off-by-one would land."""
    n = 8
    sims = base_sims(n)
    sims[:, 29] = 100.0  # overall max: top-1 class proto everywhere
    sims[:, 30] = 90.0
    m = make_metrics()
    m.update(np.zeros((n, NC), np.float32), np.zeros(n, np.int64),
             similarities=sims)
    assert m.count_array[29] == n  # in every top-5 of the class slice
    assert m.count_array[30] == n  # in every top-2 of the abstain slice
    # proto 29's giant value must not have eaten an abstain rank: abstain
    # top-2 per sample over 10 protos -> total abstain count = 2 * n
    assert m.count_array[30:].sum() == 2 * n
    assert m.count_array[:30].sum() == 5 * n


def test_no_abstain_uses_all_prototypes():
    n = 10
    m = make_metrics(abstain=False, num_classes=3)
    assert m.n_class_protos == P  # no split: all 40 are class prototypes
    sims = base_sims(n)
    sims[:, 37] = 50.0  # beyond index 30: still ranks on the class side
    m.update(np.zeros((n, 3), np.float32), np.zeros(n, np.int64),
             similarities=sims)
    assert m.count_array[37] == n
    out = m.compute()
    # top-5 = protos {37, 0, 1, 2, 3} for every sample; all 5 exceed
    # 0.05 * 10 = 0.5
    assert out["diversity"] == 5
    assert out["diversity_abstain"] == 0


def test_valid_mask_excludes_padding_from_counts_and_n():
    """Padding samples must affect neither count_array nor the n in the
    0.05*n threshold (n = valid samples, reference len(y_true_all))."""
    n = 12
    sims = base_sims(n)
    sims[:, :5] = np.array([10.0, 9.0, 8.0, 7.0, 6.0])
    sims[8:, 5] = 100.0  # only in padding rows
    valid = np.ones(n, bool)
    valid[8:] = False
    m = make_metrics()
    m.update(np.zeros((n, NC), np.float32), np.zeros(n, np.int64),
             valid=valid, similarities=sims)
    assert m.count_array[5] == 0  # padding rows never counted
    assert m.count_array[0] == 8
    out = m.compute()
    # n = 8 valid -> threshold 0.4; protos 0..4 have 8 hits each
    assert out["diversity"] == 5


def test_threshold_scales_with_n():
    """With n = 100, a prototype needs >5 hits: 5 hits out, 6 hits in."""
    n = 100
    sims = base_sims(n)
    sims[:, :5] = np.array([10.0, 9.0, 8.0, 7.0, 6.0])
    # proto 6: exactly 5 hits (== threshold, excluded);
    # proto 7: 6 hits (> threshold, included) — displacing proto 4
    sims[:5, 6] = 6.5
    sims[:5, 4] = 0.001
    sims[5:11, 7] = 6.5
    sims[5:11, 4] = 0.001
    m = make_metrics()
    m.update(np.zeros((n, NC), np.float32), np.zeros(n, np.int64),
             similarities=sims)
    assert m.count_array[6] == 5 and m.count_array[7] == 6
    out = m.compute()
    # protos 0,1,2,3 (100 hits), 4 (89), 7 (6) -> 6 diverse; proto 6 at
    # exactly 5 = 0.05*100 is excluded by the strict inequality
    assert out["diversity"] == 6
