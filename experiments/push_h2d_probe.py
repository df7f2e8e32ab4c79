#!/usr/bin/env python
"""Decompose the push-scan budget: raw relay H2D rate vs staged-batch
dispatch vs the full push loop (VERDICT round-2 item 5).

The scan ships (B, T, S, S) uint8 clips (1-channel; gray->3ch happens on
device) — 12.8 MB per batch-32 at flagship shapes — so the relay-link
ceiling is  link_MB_s / 0.401 MB  clips/s. This probe measures, on the
live chip:
  1. raw H2D: device_put of the same 12.8 MB uint8 buffer, chained;
  2. staged dispatch: the loader's fused _stage jit (H2D + preprocess);
  3. compute-only scan: push over pre-staged device batches.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/push_h2d_probe.py

MEASURED RESULTS: see bottom.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.data.transforms import make_preprocess_fn


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    b, t, s = 32, 32, 112
    rng = np.random.default_rng(0)
    clip_u8 = rng.integers(0, 255, size=(b, t, s, s), dtype=np.uint8)
    mb = clip_u8.nbytes / 1e6

    # 1. raw H2D (each put uses a fresh buffer so nothing caches)
    bufs = [clip_u8 + i for i in range(6)]
    x = jax.device_put(bufs[-1])
    x.block_until_ready()
    t0 = time.time()
    for i in range(5):
        x = jax.device_put(bufs[i])
    float(jnp.asarray(x).sum())  # forces completion (block_until_ready is
    # unreliable through the relay)
    dt = (time.time() - t0) / 5
    print(f"raw H2D: {mb:.1f} MB in {dt:.2f}s -> {mb / dt:.1f} MB/s "
          f"({b / dt:.1f} clips/s ceiling)", flush=True)

    # 2. the loader's staged dispatch (H2D + device preprocess together)
    pre = make_preprocess_fn(frames_out=t, img_size=s, do_normalize=True,
                             augment=False)
    stage = jax.jit(lambda cu, tl, gt, v: (pre(cu, tl, None), gt, v))
    t_len = np.full(b, t, np.int32)
    gt = np.zeros(b, np.int32)
    valid = np.ones(b, bool)
    out = stage(bufs[0], t_len, gt, valid)
    float(out[0].sum())
    t0 = time.time()
    for i in range(5):
        out = stage(bufs[i], t_len, gt, valid)
    float(out[0].sum())
    dt = (time.time() - t0) / 5
    print(f"staged dispatch: {dt:.2f}s/batch -> {b / dt:.1f} clips/s",
          flush=True)


if __name__ == "__main__":
    main()


# MEASURED RESULTS (filled after runs):
