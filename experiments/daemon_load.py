"""Serving-daemon load test: overhead and end-to-end throughput.

Two questions, two modes:

- ``--null``: how much does the daemon itself (HTTP + queue + coalesce +
  pad + slice) cost per sample? Serves a no-op fn on CPU, so every
  millisecond measured is daemon overhead, an upper bound on what the
  batching layer adds in front of any model.
- default (TPU): end-to-end clips/s + latency through the daemon with the
  flagship video bundle on the real chip. NOTE on this dev host the chip
  sits behind a relay (~55 MB/s staged via jit args, CLAUDE.md) and a
  float32 112x112x32 clip is 4.8 MB — the e2e number is LINK-bound here,
  not daemon- or compute-bound; on a PCIe serving host H2D is ~1 ms per
  batch and the compute ceiling (638 clips/s bf16, BASELINE.md) governs.

Usage:
    python -m experiments.daemon_load --null
    PYTHONPATH=/root/repo:/root/.axon_site python -m experiments.daemon_load \
        [--clients 4] [--seconds 20] [--req_batch 4] [--max_batch 16]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np


def _post(url: str, arr: np.ndarray) -> np.ndarray:
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(url + "/v1/predict", data=buf.getvalue(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        return np.load(io.BytesIO(r.read()), allow_pickle=False)


def run_load(fn, sample_shape, sample_ndim, clients: int, seconds: float,
             req_batch: int, max_batch: int, max_delay_ms: float,
             label: str, dtype=np.float32):
    from protoasnet_tpu.server import DynamicBatcher, make_handler

    batcher = DynamicBatcher(fn, max_batch=max_batch,
                             max_delay_ms=max_delay_ms, dtype=dtype)
    t0 = time.monotonic()
    batcher.warmup(sample_shape)
    warm_s = time.monotonic() - t0
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(batcher, sample_ndim))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    stop = threading.Event()
    counts = [0] * clients
    rng = np.random.default_rng(0)
    if np.dtype(dtype) == np.uint8:
        x = rng.integers(0, 256, size=(req_batch, *sample_shape),
                         dtype=np.uint8)
    else:
        x = rng.normal(size=(req_batch, *sample_shape)).astype(np.float32)

    def client(i):
        while not stop.is_set():
            _post(url, x)
            counts[i] += req_batch

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    elapsed = time.monotonic() - t0
    snap = batcher.stats.snapshot()
    httpd.shutdown()
    httpd.server_close()
    batcher.close()
    total = sum(counts)
    print(json.dumps({
        "mode": label,
        "samples_per_sec": round(total / elapsed, 2),
        "requests": snap["requests"],
        "mean_batch": round(snap["mean_batch"] or 0, 2),
        "padding_frac": round(snap["padding_frac"], 4),
        "latency_ms_p50": round(snap["latency_ms_p50"] or 0, 2),
        "latency_ms_p95": round(snap["latency_ms_p95"] or 0, 2),
        "overhead_us_per_sample": round(1e6 * elapsed * clients / max(1, total), 1),
        "warmup_s": round(warm_s, 1),
        "clients": clients, "req_batch": req_batch, "max_batch": max_batch,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--null", action="store_true",
                    help="no-op fn on CPU: daemon overhead only")
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=20)
    ap.add_argument("--req_batch", type=int, default=4)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--max_delay_ms", type=float, default=5.0)
    ap.add_argument("--uint8", action="store_true",
                    help="uint8-gray wire format (the --uint8_input path)")
    ap.add_argument("--int8", action="store_true",
                    help="w8a8 backbone via quant.py (the serve --int8 path)")
    ap.add_argument("--img_size", type=int, default=112)
    ap.add_argument("--frames", type=int, default=32)
    a = ap.parse_args()

    if a.null:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # small samples: isolates queue/coalesce/HTTP bookkeeping from
        # payload transport (client threads share this process's GIL, so
        # video-sized bodies would measure memcpy, not the daemon)
        sample_shape = (8, 8, 3)
        run_load(lambda x: x[:, 0, 0, :4], sample_shape, 3,
                 a.clients, a.seconds, a.req_batch, a.max_batch,
                 a.max_delay_ms, "null-fn (daemon overhead only)")
        return

    import jax
    import jax.numpy as jnp

    from protoasnet_tpu.models.builder import build_model, init_model

    cfg = {"name": "Video_XProtoNet", "base_architecture": "resnet2p1d_18",
           "backbone_last_layer_num": -3,
           "prototype_shape": (40, 256, 1, 1, 1), "num_classes": 4,
           "img_size": a.img_size, "dtype": "bfloat16"}
    model = build_model(cfg)
    model_in = (a.frames, a.img_size, a.img_size, 3)
    params, stats = init_model(model, jnp.zeros((1, *model_in)), seed=0)
    variables = {"params": params, "batch_stats": stats}

    apply_fn = lambda v, x: model.apply(v, x, train=False)[0]
    if a.int8:
        # the serve --int8 path: w8a8 backbone, scales calibrated once
        from protoasnet_tpu.quant import (apply_quantized, build_qstate,
                                          calibrate_act_scales)

        calib = jnp.asarray(np.random.default_rng(1)
                            .normal(size=(4, *model_in)).astype(np.float32))
        qstate = build_qstate(variables,
                              calibrate_act_scales(model, variables, [calib]))
        apply_fn = lambda v, x: apply_quantized(model, v, qstate, x)[0]

    if a.uint8:
        # the --uint8_input serving path: raw gray uint8 over the wire,
        # /255 + normalize + gray->3ch ON DEVICE — 12x fewer H2D bytes
        from protoasnet_tpu.data.transforms import normalize

        def forward(v, x):
            xf = normalize(x.astype(jnp.float32) * (1.0 / 255.0))
            xf = jnp.broadcast_to(xf[..., None], xf.shape + (3,))
            return apply_fn(v, xf)

        sample_shape = model_in[:-1]
        label = "uint8-gray wire"
    else:
        def forward(v, x):
            return apply_fn(v, x)

        sample_shape = model_in
        label = "float32 wire"
    if a.int8:
        label += " + int8 backbone"

    fwd = jax.jit(forward)

    def fn(x):
        # numpy straight into the jit call: the relay stages jit args at
        # ~55 MB/s vs ~0.2 MB/s for an explicit device_put (CLAUDE.md)
        return np.asarray(fwd(variables, x), np.float32)

    run_load(fn, sample_shape, len(sample_shape), a.clients, a.seconds,
             a.req_batch, a.max_batch, a.max_delay_ms,
             f"flagship video, {label}, on {jax.devices()[0].platform}",
             dtype=np.uint8 if a.uint8 else np.float32)


if __name__ == "__main__":
    main()
