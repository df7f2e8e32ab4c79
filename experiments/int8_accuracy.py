#!/usr/bin/env python
"""Quantization accuracy study: fp vs w8a8 metrics on a TRAINED flagship.

Loads a finished training run (main.py save_dir), rebuilds the agent from
its dumped config, then evaluates the val split twice through the SAME
loader batches: once with the model's own (bf16/fp32) forward, once with
quant.py's int8 backbone — reporting mean AUROC / balanced accuracy / F1
for both and the deltas. This is the deployment go/no-go number for the
int8 serving path (logit-level agreement is pinned separately in
tests/test_quant.py and experiments/int8_serving_ab.py).

Usage: python -m experiments.int8_accuracy --run_dir /tmp/q_acc/run/trained
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _metrics(name, logits, targets, abstain):
    from sklearn.metrics import balanced_accuracy_score, f1_score, roc_auc_score

    logits = np.asarray(logits, np.float64)
    if abstain:  # reference semantics: strip the abstain logit, re-softmax
        logits = logits[:, :-1]
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    preds = probs.argmax(axis=1)
    present = np.unique(targets)
    try:
        auc = roc_auc_score(targets, probs[:, present] if len(present) <
                            probs.shape[1] else probs, multi_class="ovr",
                            average="weighted",
                            labels=present if len(present) < probs.shape[1]
                            else None)
    except ValueError:
        auc = float("nan")
    bacc = balanced_accuracy_score(targets, preds)
    f1 = f1_score(targets, preds, average="macro")
    log(f"{name:>5}: AUROC {auc:.4f}  bal-acc {bacc:.4f}  macro-F1 {f1:.4f}")
    return auc, bacc, f1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--calib_batches", type=int, default=4)
    args = ap.parse_args()

    import jax
    import yaml

    from protoasnet_tpu.quant import (apply_quantized, build_qstate,
                                      calibrate_act_scales)
    from protoasnet_tpu.train.agents import build_agent

    cfgs = sorted(glob.glob(os.path.join(args.run_dir, "config_*.yml")))
    assert cfgs, f"no dumped config under {args.run_dir}"
    with open(cfgs[0]) as f:
        config = yaml.safe_load(f)
    config["save_dir"] = args.run_dir  # auto-resume loads last.ckpt
    config["train"]["save"] = False
    agent = build_agent(config)
    assert agent.current_epoch > 0, "checkpoint did not load"
    log(f"loaded {args.run_dir} at epoch {agent.current_epoch}")

    model = agent.model
    variables = {"params": agent.params, "batch_stats": agent.batch_stats}

    # calibration: first few TRAIN batches (never the eval split)
    calib = []
    for batch in agent.data_loaders["train"]:
        calib.append(batch["cine"])
        if len(calib) >= args.calib_batches:
            break
    scales = calibrate_act_scales(model, variables, calib)
    qstate = build_qstate(variables, scales)
    log(f"calibrated {len(scales)} convs")

    fwd_fp = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
    fwd_q = jax.jit(lambda v, q, x: apply_quantized(model, v, q, x)[0])

    lf, lq, ys = [], [], []
    for batch in agent.data_loaders["val"]:
        x = batch["cine"]
        lf.append(np.asarray(fwd_fp(variables, x), np.float32))
        lq.append(np.asarray(fwd_q(variables, qstate, x), np.float32))
        ys.append(np.asarray(batch["target_AS"]))
    lf, lq = np.concatenate(lf), np.concatenate(lq)
    ys = np.concatenate(ys)
    log(f"val: {len(ys)} clips")

    abstain = bool(config.get("abstain_class", False))
    a_fp, b_fp, f_fp = _metrics("fp", lf, ys, abstain)
    a_q, b_q, f_q = _metrics("int8", lq, ys, abstain)
    rel = np.abs(lf - lq).max() / (np.abs(lf).max() + 1e-9)
    print(f"AUROC fp {a_fp:.4f} int8 {a_q:.4f} delta {a_q - a_fp:+.4f} | "
          f"bal-acc delta {b_q - b_fp:+.4f} | F1 delta {f_q - f_fp:+.4f} | "
          f"logit rel err {rel:.4f}")


if __name__ == "__main__":
    main()
