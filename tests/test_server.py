"""Serving daemon: dynamic batching correctness (coalescing, bucket padding,
ordering, error propagation) + the HTTP front end end-to-end.

Batcher-logic tests run against plain numpy fns (no compiles); one
integration test drives the HTTP server over a real exported bundle."""

import io
import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from protoasnet_tpu.server import DynamicBatcher, _bucket_ladder, make_handler


def _identity_sum(x):
    """Per-sample reduction that exposes padding bugs (padding rows -> 0)."""
    return x.sum(axis=(1, 2))


def test_bucket_ladder():
    assert _bucket_ladder(1) == (1,)
    assert _bucket_ladder(8) == (1, 2, 4, 8)
    assert _bucket_ladder(12) == (1, 2, 4, 8, 12)
    assert _bucket_ladder(128) == (1, 2, 4, 8, 16, 32, 64, 128)


def test_single_request_roundtrip():
    b = DynamicBatcher(_identity_sum, max_batch=8, max_delay_ms=1.0)
    try:
        x = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
        out = b.submit(x)
        np.testing.assert_allclose(out, x.sum(axis=(1, 2)))
        assert b.stats.snapshot()["samples"] == 2
    finally:
        b.close()


def test_concurrent_requests_coalesce_and_map_back():
    """N threads submit distinct inputs inside one delay window; every
    caller gets exactly its own rows back and the batch count shows
    coalescing happened."""
    calls = []

    def fn(x):
        calls.append(len(x))
        return _identity_sum(x)

    b = DynamicBatcher(fn, max_batch=16, max_delay_ms=200.0)
    results = {}
    errs = []

    def worker(i):
        x = np.full((1, 4, 4), float(i + 1), np.float32)
        try:
            results[i] = b.submit(x, timeout=30)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    try:
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        for i in range(6):
            np.testing.assert_allclose(results[i], [(i + 1) * 16.0])
        snap = b.stats.snapshot()
        assert snap["samples"] == 6
        # 6 samples in a 200ms window must land in far fewer than 6 batches
        assert snap["batches"] < 6
        assert snap["mean_batch"] > 1.0
    finally:
        b.close()


def test_bucket_padding_is_invisible():
    """3 samples pad to bucket 4; caller sees exactly 3 rows, correct."""
    seen = []

    def fn(x):
        seen.append(x.shape[0])
        return _identity_sum(x)

    b = DynamicBatcher(fn, max_batch=8, max_delay_ms=1.0)
    try:
        x = np.ones((3, 2, 2), np.float32)
        out = b.submit(x)
        assert out.shape == (3,)
        np.testing.assert_allclose(out, [4.0, 4.0, 4.0])
        assert seen == [4]  # padded to the 4-bucket
        assert b.stats.snapshot()["padding_frac"] == pytest.approx(0.25)
    finally:
        b.close()


def test_oversized_group_splits_into_two_batches():
    """Requests that overflow max_batch are served as separate flushes."""
    seen = []

    def fn(x):
        seen.append(x.shape[0])
        return _identity_sum(x)

    b = DynamicBatcher(fn, max_batch=4, max_delay_ms=300.0)
    try:
        outs = {}

        def worker(i):
            outs[i] = b.submit(np.full((3, 2, 2), float(i), np.float32),
                               timeout=30)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        np.testing.assert_allclose(outs[0], [0.0] * 3)
        np.testing.assert_allclose(outs[1], [4.0] * 3)
        assert sorted(seen) == [4, 4]  # two flushes, each 3 -> bucket 4
    finally:
        b.close()


def test_request_larger_than_max_batch_rejected():
    b = DynamicBatcher(_identity_sum, max_batch=4, max_delay_ms=1.0)
    try:
        with pytest.raises(ValueError, match="split the request"):
            b.submit(np.ones((5, 2, 2), np.float32))
    finally:
        b.close()


def test_error_propagates_to_waiter_and_batcher_survives():
    state = {"fail": True}

    def fn(x):
        if state["fail"]:
            raise RuntimeError("boom")
        return _identity_sum(x)

    b = DynamicBatcher(fn, max_batch=4, max_delay_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            b.submit(np.ones((1, 2, 2), np.float32), timeout=10)
        state["fail"] = False
        out = b.submit(np.ones((1, 2, 2), np.float32), timeout=10)
        np.testing.assert_allclose(out, [4.0])
        assert b.stats.snapshot()["errors"] == 1
    finally:
        b.close()


def test_close_fails_straggler_requests_fast():
    """A request racing past close() is failed by the drain, not left to
    hang until its timeout."""
    from protoasnet_tpu.server import _Pending

    b = DynamicBatcher(_identity_sum, max_batch=4, max_delay_ms=1.0)
    straggler = _Pending(np.ones((1, 2, 2), np.float32))
    b._q.put(None)       # what close() enqueues
    b._q.put(straggler)  # raced in behind the sentinel
    assert straggler.event.wait(10)
    assert isinstance(straggler.error, RuntimeError)
    b._thread.join(timeout=10)
    assert not b._thread.is_alive()


# --- HTTP front end ----------------------------------------------------------


@pytest.fixture(scope="module")
def small_model():
    import jax.numpy as jnp

    from protoasnet_tpu.models.builder import build_model, init_model

    cfg = {"name": "XProtoNet", "base_architecture": "resnet18",
           "prototype_shape": (8, 64, 1, 1), "num_classes": 4, "img_size": 32}
    model = build_model(cfg)
    params, stats = init_model(model, jnp.zeros((1, 32, 32, 3)), seed=0)
    return model, params, stats


@pytest.fixture(scope="module")
def fwd(small_model):
    import jax

    model = small_model[0]
    return jax.jit(lambda v, x: model.apply(v, x, train=False)[0])


def _post_npy(url, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(url, data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return np.load(io.BytesIO(r.read()), allow_pickle=False)


@pytest.fixture()
def http_server():
    """Ephemeral-port server over a numpy fn; yields (base_url, batcher)."""
    batcher = DynamicBatcher(_identity_sum, max_batch=8, max_delay_ms=2.0)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(batcher, sample_ndim=2))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_address[1]}", batcher
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()


def test_http_predict_health_stats(http_server):
    url, _ = http_server
    with urllib.request.urlopen(url + "/healthz", timeout=10) as r:
        assert r.read() == b"ok"
    x = np.random.default_rng(0).normal(size=(3, 4, 4)).astype(np.float32)
    out = _post_npy(url + "/v1/predict", x)
    np.testing.assert_allclose(out, x.sum(axis=(1, 2)), rtol=1e-6)
    # single sample without batch dim is accepted too
    out1 = _post_npy(url + "/v1/predict", x[0])
    np.testing.assert_allclose(out1, x[:1].sum(axis=(1, 2)), rtol=1e-6)
    with urllib.request.urlopen(url + "/v1/stats", timeout=10) as r:
        snap = json.loads(r.read())
    assert snap["samples"] == 4 and snap["latency_ms_p50"] is not None


def test_prometheus_text_format():
    from protoasnet_tpu.server import prometheus_text

    snap = {"requests": 7, "samples": 21, "batches": 3, "mean_batch": 7.0,
            "padding_frac": 0.125, "errors": 1, "abandoned": 2,
            "bucket_counts": {"8": 2, "16": 1},
            "latency_ms_p50": 1.5, "latency_ms_p95": 3.25,
            "latency_ms_p99": 9.0, "latency_ms_count": 7,
            "latency_ms_sum": 23.75}
    text = prometheus_text(snap, healthy=True)
    lines = text.splitlines()
    assert "protoasnet_healthy 1" in lines
    assert "protoasnet_requests_total 7" in lines
    assert "protoasnet_samples_total 21" in lines
    assert "protoasnet_errors_total 1" in lines
    assert "protoasnet_abandoned_total 2" in lines
    assert "protoasnet_padding_fraction 0.125" in lines
    assert "protoasnet_mean_batch_size 7.0" in lines
    # quantile keys map p50/p95/p99 -> 0.5/0.95/0.99 labels
    assert 'protoasnet_request_latency_ms{quantile="0.5"} 1.5' in lines
    assert 'protoasnet_request_latency_ms{quantile="0.95"} 3.25' in lines
    assert 'protoasnet_request_latency_ms{quantile="0.99"} 9.0' in lines
    assert 'protoasnet_batches_by_bucket_total{bucket="8"} 2' in lines
    assert 'protoasnet_batches_by_bucket_total{bucket="16"} 1' in lines
    # summary emits the _count/_sum series strict OpenMetrics parsers need
    assert "protoasnet_request_latency_ms_count 7" in lines
    assert any(ln.startswith("protoasnet_request_latency_ms_sum ")
               for ln in lines)
    # every sample line's metric name is TYPE-declared (scrape validity);
    # a summary family declaration also covers its _count/_sum suffixes
    declared = {ln.split()[2] for ln in lines if ln.startswith("# TYPE")}
    summaries = {ln.split()[2] for ln in lines
                 if ln.startswith("# TYPE") and ln.rstrip().endswith("summary")}
    declared |= {s + suf for s in summaries for suf in ("_count", "_sum")}
    for ln in lines:
        if not ln.startswith("#"):
            assert ln.split("{")[0].split(" ")[0] in declared
    # fresh daemon: no latency samples yet, unhealthy, metric lines absent
    empty = prometheus_text(
        {"requests": 0, "samples": 0, "batches": 0, "mean_batch": None,
         "padding_frac": 0.0, "errors": 0, "abandoned": 0,
         "bucket_counts": {}, "latency_ms_p50": None,
         "latency_ms_p95": None, "latency_ms_p99": None}, healthy=False)
    assert "protoasnet_healthy 0" in empty.splitlines()
    assert "quantile=" not in empty and "mean_batch_size 0" not in empty


def test_http_metrics_endpoint(http_server):
    url, _ = http_server
    x = np.random.default_rng(0).normal(size=(3, 4, 4)).astype(np.float32)
    _post_npy(url + "/v1/predict", x)
    with urllib.request.urlopen(url + "/metrics", timeout=10) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    lines = body.splitlines()
    assert "protoasnet_healthy 1" in lines
    assert "protoasnet_samples_total 3" in lines
    assert any(ln.startswith("protoasnet_request_latency_ms{quantile=")
               for ln in lines)


def test_http_request_over_max_batch_is_chunked(http_server):
    url, batcher = http_server
    x = np.ones((19, 4, 4), np.float32)  # > max_batch=8 -> 3 chunks
    out = _post_npy(url + "/v1/predict", x)
    assert out.shape == (19,)
    np.testing.assert_allclose(out, 16.0)
    assert batcher.stats.snapshot()["batches"] >= 3


def test_http_bad_payload_is_400(http_server):
    url, _ = http_server
    req = urllib.request.Request(url + "/v1/predict", data=b"not npy",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400


def test_http_bundle_end_to_end(tmp_path, small_model, fwd):
    """Real path: exported bundle -> bundle_input_spec -> warmed batcher ->
    HTTP predict matches the live jitted forward."""
    from protoasnet_tpu.serve import (bundle_input_spec,
                                      load_serving_bundle,
                                      save_serving_bundle)

    model, params, stats = small_model
    path = str(tmp_path / "model.bundle")
    save_serving_bundle(path, model, params, stats, (32, 32, 3))

    shape, dtype = bundle_input_spec(path)
    assert shape == (None, 32, 32, 3) and dtype == np.float32

    fn = load_serving_bundle(path)
    batcher = DynamicBatcher(fn, max_batch=4, max_delay_ms=2.0,
                             buckets=(1, 2, 4))
    batcher.warmup(shape[1:])
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(batcher, sample_ndim=3))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        x = np.random.default_rng(2).normal(size=(3, 32, 32, 3)) \
            .astype(np.float32)
        got = _post_npy(url + "/v1/predict", x)
        want = np.asarray(fwd({"params": params, "batch_stats": stats}, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()


def test_low_load_latency_bounded_by_window():
    """A lone request must not wait for a full batch — only the window."""
    b = DynamicBatcher(_identity_sum, max_batch=128, max_delay_ms=20.0)
    try:
        t0 = time.monotonic()
        b.submit(np.ones((1, 2, 2), np.float32), timeout=10)
        elapsed = time.monotonic() - t0
        assert elapsed < 5.0  # window is 20ms; generous CI bound
    finally:
        b.close()


def test_uint8_dtype_batcher_pads_and_serves():
    """uint8 bundles: the batcher stages uint8 end to end (12x fewer
    wire/H2D bytes than float32 RGB); padding stays invisible."""
    seen_dtypes = []

    def fn(x):
        seen_dtypes.append(x.dtype)
        return x.astype(np.float32).sum(axis=(1, 2))

    b = DynamicBatcher(fn, max_batch=8, max_delay_ms=1.0, dtype=np.uint8)
    try:
        x = np.full((3, 2, 2), 7, np.uint8)
        out = b.submit(x)
        np.testing.assert_allclose(out, [28.0, 28.0, 28.0])
        assert seen_dtypes == [np.dtype(np.uint8)]
    finally:
        b.close()


def test_mesh_sharded_daemon_parity(small_model, fwd):
    """Live multi-device mode: the batcher feeding make_sharded_serving_fn
    over the 8-device mesh (uint8 in, transform on device, n_dev-multiple
    buckets) returns the same logits as the single-device float path."""
    import jax.numpy as jnp

    from protoasnet_tpu.data.transforms import normalize
    from protoasnet_tpu.parallel import make_mesh
    from protoasnet_tpu.serve import make_sharded_serving_fn

    model, params, stats = small_model
    variables = {"params": params, "batch_stats": stats}
    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    assert n_dev == 8
    sharded = make_sharded_serving_fn(model, mesh, uint8_gray=True)

    b = DynamicBatcher(
        lambda x: np.asarray(sharded(variables, x), np.float32),
        max_batch=16, max_delay_ms=1.0, buckets=(8, 16), dtype=np.uint8)
    try:
        rng = np.random.default_rng(11)
        xu8 = rng.integers(0, 256, size=(5, 32, 32), dtype=np.uint8)
        got = b.submit(xu8, timeout=120)  # 5 -> padded to the 8-bucket
        xf = normalize(jnp.asarray(xu8, jnp.float32) / 255.0)
        xf = jnp.broadcast_to(xf[..., None], xf.shape + (3,))
        want = np.asarray(fwd(variables, xf))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        assert b.stats.snapshot()["bucket_counts"] == {"8": 1}
    finally:
        b.close()


def test_shape_mismatch_cannot_poison_other_requests():
    """With sample_shape set, a wrong-shape request is rejected at submit;
    without it, mismatched shapes land in separate flushes — either way a
    valid concurrent request still succeeds."""
    b = DynamicBatcher(_identity_sum, max_batch=8, max_delay_ms=200.0,
                       sample_shape=(4, 4))
    try:
        with pytest.raises(ValueError, match="sample shape"):
            b.submit(np.ones((1, 3, 3), np.float32))
        out = b.submit(np.ones((1, 4, 4), np.float32), timeout=30)
        np.testing.assert_allclose(out, [16.0])
    finally:
        b.close()

    # no sample_shape declared: the dispatcher groups by shape instead
    seen = []

    def fn(x):
        seen.append(x.shape)
        return _identity_sum(x)

    b2 = DynamicBatcher(fn, max_batch=8, max_delay_ms=300.0)
    outs, errs = {}, []

    def worker(i, shape):
        try:
            outs[i] = b2.submit(np.ones((1, *shape), np.float32), timeout=30)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    try:
        ts = [threading.Thread(target=worker, args=(0, (4, 4))),
              threading.Thread(target=worker, args=(1, (3, 3)))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs  # both served, in separate shape groups
        assert len(seen) == 2 and {s[1:] for s in seen} == {(4, 4), (3, 3)}
    finally:
        b2.close()


def test_float_payload_to_uint8_daemon_rejected():
    """Silent float->uint8 truncation would return confident garbage;
    the batcher must reject the cast instead."""
    b = DynamicBatcher(lambda x: x.astype(np.float32).sum(axis=(1, 2)),
                       max_batch=4, max_delay_ms=1.0, dtype=np.uint8)
    try:
        with pytest.raises(ValueError, match="castable"):
            b.submit(np.ones((1, 2, 2), np.float32) / 255.0)
        # uint8 -> float32 upcast IS allowed on a float daemon
        bf = DynamicBatcher(_identity_sum, max_batch=4, max_delay_ms=1.0)
        out = bf.submit(np.ones((1, 2, 2), np.uint8), timeout=10)
        np.testing.assert_allclose(out, [4.0])
        bf.close()
    finally:
        b.close()


def test_timed_out_request_is_not_computed():
    """A request whose waiter timed out while queued is dropped by the
    dispatcher instead of burning fn time (overload spiral guard)."""
    release = threading.Event()
    computed = []

    def slow_fn(x):
        release.wait(30)
        computed.append(int(x.shape[0]))
        return _identity_sum(x)

    b = DynamicBatcher(slow_fn, max_batch=1, max_delay_ms=0.0)
    try:
        t1 = threading.Thread(
            target=lambda: b.submit(np.ones((1, 2, 2), np.float32),
                                    timeout=30))
        t1.start()
        time.sleep(0.2)  # dispatcher is now blocked inside slow_fn
        with pytest.raises(TimeoutError):
            b.submit(np.zeros((1, 2, 2), np.float32), timeout=0.3)
        release.set()
        t1.join(timeout=30)
        time.sleep(0.5)  # let the dispatcher drain the abandoned pending
        assert sum(computed) == 1  # the abandoned request never ran
        assert b.stats.snapshot()["abandoned"] == 1
    finally:
        b.close()


def test_http_status_codes(http_server):
    url, _ = http_server
    # oversized Content-Length -> 413 before the body is read
    req = urllib.request.Request(url + "/v1/predict",
                                 data=b"x" * 10, method="POST")
    req.add_header("Content-Length", str(1 << 40))
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 413
    # wrong dtype -> 400 (client fault), not 200-with-garbage
    buf = io.BytesIO()
    np.save(buf, np.ones((1, 4, 4), np.complex64))
    req = urllib.request.Request(url + "/v1/predict", data=buf.getvalue(),
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400


def test_chunk_timeout_abandons_sibling_chunks():
    """submit_many timeout: the unserved sibling chunks are flagged
    abandoned so the dispatcher never spends compute on work whose reader
    already gave up (the overload-spiral guard, SERVING.md)."""
    calls = []

    def slow_fn(x):
        calls.append(int(x.shape[0]))
        time.sleep(0.25)
        return _identity_sum(x)

    b = DynamicBatcher(slow_fn, max_batch=2, max_delay_ms=1.0)
    try:
        x = np.ones((8, 3, 3), np.float32)  # 4 chunks, 0.25 s each
        with pytest.raises(TimeoutError):
            b.submit_many(x, timeout=0.3)
        time.sleep(1.5)  # let the dispatcher drain the dead chunks
        # chunk 1 computed (maybe chunk 2 was already in flight at the
        # timeout); chunks after that were dropped before compute
        assert len(calls) <= 2
        assert b.stats.snapshot()["abandoned"] >= 2
    finally:
        b.close()


def test_dispatch_thread_death_fails_waiters_and_healthz():
    """If the dispatch thread dies on an unexpected error (anything
    _flush's own try can't contain), waiters get a loud error instead of
    hanging, new submits fail fast, and /healthz flips to 503 so an
    orchestrator restarts the daemon instead of routing to a zombie."""
    b = DynamicBatcher(_identity_sum, max_batch=4, max_delay_ms=1.0)

    def boom(group, total):
        raise RuntimeError("boom")

    b._flush = boom  # simulate a failure outside _flush's internal try
    with pytest.raises(RuntimeError, match="dispatch thread died"):
        b.submit(np.ones((1, 2, 2), np.float32), timeout=10)
    assert not b.healthy
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.ones((1, 2, 2), np.float32), timeout=1)

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(b, sample_ndim=2))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(url + "/healthz", timeout=10)
        assert ei.value.code == 503
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_empty_body_is_400_not_503(http_server):
    """np.load raises EOFError (not ValueError) on an empty body — it must
    still map to 400 client fault, or well-behaved clients retry a
    permanently-bad request forever against a 'server error'."""
    url, _ = http_server
    req = urllib.request.Request(url + "/v1/predict", data=b"", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400


def test_http_413_closes_connection():
    """The 413 path never reads the request body, so the server must close
    the keep-alive connection (and say so) — otherwise the client's unread
    npy bytes get parsed as the next request line."""
    import http.client

    b = DynamicBatcher(_identity_sum, max_batch=4, max_delay_ms=1.0)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(b, sample_ndim=2, max_body_bytes=1024))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection(
            "127.0.0.1", httpd.server_address[1], timeout=10)
        conn.request("POST", "/v1/predict", body=b"x" * 4096)
        r = conn.getresponse()
        assert r.status == 413
        assert r.getheader("Connection") == "close"
        r.read()
        conn.close()
        # fresh connections keep working
        buf = io.BytesIO()
        np.save(buf, np.ones((1, 4, 4), np.float32))
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        req = urllib.request.Request(url + "/v1/predict",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == 200
    finally:
        httpd.shutdown()
        httpd.server_close()
        b.close()


def test_serve_loop_ready_port_and_stop_event():
    """_serve_loop's embedding contract (SERVING.md): port=0 binds an
    ephemeral port published as ready_event.port, and setting stop_event
    shuts the loop down cleanly (server closed, batcher drained) without
    signals. Null fn -> every millisecond here is daemon plumbing."""
    from protoasnet_tpu.server import _serve_loop

    ready, stop = threading.Event(), threading.Event()
    t = threading.Thread(
        target=_serve_loop,
        args=(_identity_sum, (4, 4), np.float32, "127.0.0.1", 0, 8, 2.0,
              False, ready),
        kwargs=dict(stop_event=stop),
        daemon=True)
    t.start()
    try:
        assert ready.wait(30), "serve loop never bound its socket"
        assert ready.port != 0
        url = f"http://127.0.0.1:{ready.port}/v1/predict"
        x = np.random.default_rng(1).normal(size=(3, 4, 4)).astype(np.float32)
        out = _post_npy(url, x)
        np.testing.assert_allclose(out, x.sum(axis=(1, 2)), rtol=1e-6)
    finally:
        stop.set()
        t.join(timeout=30)
    assert not t.is_alive()


# -- client library (protoasnet_tpu/client.py) ------------------------------


@pytest.fixture()
def live_loop():
    """A _serve_loop daemon over _identity_sum via the embedding contract
    (ready_event.port + stop_event), torn down cleanly per test."""
    from protoasnet_tpu.server import _serve_loop

    ready, stop = threading.Event(), threading.Event()
    t = threading.Thread(
        target=_serve_loop,
        args=(_identity_sum, (4, 4), np.float32, "127.0.0.1", 0, 4, 2.0,
              False, ready),
        kwargs=dict(stop_event=stop),
        daemon=True)
    t.start()
    assert ready.wait(30)
    yield f"http://127.0.0.1:{ready.port}"
    stop.set()
    t.join(timeout=30)
    assert not t.is_alive()


def test_client_spec_health_and_chunked_predict(live_loop):
    """ServingClient discovers the contract from /v1/spec, chunks a large
    array to the server's 16*max_batch request ceiling, and reassembles
    per-sample outputs in order."""
    from protoasnet_tpu.client import ServingClient

    c = ServingClient(live_loop, timeout_s=60)
    assert c.healthy()
    spec = c.spec()
    assert spec["sample_shape"] == [4, 4]
    assert spec["dtype"] == "float32"
    assert spec["max_batch"] == 4
    assert spec["max_body_bytes"] > 0

    # 100 samples > 16*max_batch=64 -> must split into 2 HTTP requests
    x = np.random.default_rng(0).normal(size=(100, 4, 4))  # float64 on
    out = c.predict(x)  # purpose: client downcasts to the wire dtype
    np.testing.assert_allclose(out, x.astype(np.float32).sum(axis=(1, 2)),
                               rtol=1e-6)
    assert c.stats()["requests"] >= 2


def test_client_unbatched_sample_and_bad_request(live_loop):
    from protoasnet_tpu.client import BadRequestError, ServingClient

    c = ServingClient(live_loop, timeout_s=60)
    x = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = c.predict(x)  # rank == sample rank -> unbatched in, unbatched out
    assert np.ndim(out) == 0
    np.testing.assert_allclose(out, x.sum(), rtol=1e-6)

    with pytest.raises(BadRequestError):  # wrong sample shape -> server 400
        c.predict(np.zeros((2, 5, 5), np.float32))
    with pytest.raises(BadRequestError):  # client-side empty-input guard
        c.predict(np.zeros((0, 4, 4), np.float32))


def test_client_retry_then_raise():
    """RetryableError is retried with backoff; BadRequestError is not."""
    from protoasnet_tpu.client import (BadRequestError, RetryableError,
                                       ServingClient)

    c = ServingClient("http://127.0.0.1:1", retries=2, backoff_s=0.0)
    calls = []

    def flaky(path, body=None):
        calls.append(path)
        if len(calls) < 3:
            raise RetryableError(503, "boom")
        return b"ok"

    c._request = flaky
    assert c._request_retry("/x") == b"ok"
    assert len(calls) == 3

    calls.clear()

    def dead(path, body=None):
        calls.append(path)
        raise RetryableError(504, "still down")

    c._request = dead
    with pytest.raises(RetryableError):
        c._request_retry("/x")
    assert len(calls) == 3  # initial + 2 retries, then give up

    calls.clear()

    def bad(path, body=None):
        calls.append(path)
        raise BadRequestError(400, "your fault")

    c._request = bad
    with pytest.raises(BadRequestError):
        c._request_retry("/x")
    assert len(calls) == 1  # never retried


def test_client_connection_refused_is_retryable():
    from protoasnet_tpu.client import RetryableError, ServingClient

    c = ServingClient("http://127.0.0.1:1", timeout_s=2, retries=0)
    assert not c.healthy()
    with pytest.raises(RetryableError):
        c.stats()


def test_client_uint8_daemon_contract():
    """Against a uint8-wire daemon the client ships uint8 untouched and
    REFUSES to coerce float frames (lossy) — the server's 400 surfaces as
    BadRequestError instead of silently-truncated garbage."""
    from protoasnet_tpu.client import BadRequestError, ServingClient
    from protoasnet_tpu.server import _serve_loop

    ready, stop = threading.Event(), threading.Event()
    t = threading.Thread(
        target=_serve_loop,
        args=(lambda x: x.astype(np.float32).sum(axis=(1, 2)), (4, 4),
              np.uint8, "127.0.0.1", 0, 4, 2.0, False, ready),
        kwargs=dict(stop_event=stop),
        daemon=True)
    t.start()
    try:
        assert ready.wait(30)
        c = ServingClient(f"http://127.0.0.1:{ready.port}", timeout_s=60)
        assert c.spec()["dtype"] == "uint8"
        x = np.arange(32, dtype=np.uint8).reshape(2, 4, 4)
        np.testing.assert_allclose(
            c.predict(x), x.astype(np.float32).sum(axis=(1, 2)))
        with pytest.raises(BadRequestError):
            c.predict(np.zeros((2, 4, 4), np.float32))
    finally:
        stop.set()
        t.join(timeout=30)


def test_client_spec_cache_semantics_and_no_upcast(live_loop):
    """Review fixes: (a) definitive /v1/spec misses (404, non-dict 200)
    are cached — one probe per client; (b) transient transport failures
    are NOT cached (a blip during the first call must not permanently
    disable chunking) but cost at most one probe per predict(); (c)
    _coerce only casts when it SHRINKS the payload (float16 ships as
    float16; the server upcasts free server-side)."""
    from protoasnet_tpu.client import (BadRequestError, RetryableError,
                                       ServingClient)

    x = np.ones((3, 4, 4), np.float32)

    # (a) definitive miss (pre-spec daemon 404): cached after one probe
    c = ServingClient(live_loop, timeout_s=60, retries=0)
    real = c._request
    probes = []

    def gone(path, body=None):
        if path == "/v1/spec":
            probes.append(path)
            raise BadRequestError(404, "not found")
        return real(path, body)

    c._request = gone
    np.testing.assert_allclose(c.predict(x), x.sum(axis=(1, 2)))
    np.testing.assert_allclose(c.predict(x), x.sum(axis=(1, 2)))
    assert len(probes) == 1  # second predict() used the cached miss

    # (a') a proxy answering 200 + non-dict JSON is also a definitive miss
    c1 = ServingClient(live_loop, timeout_s=60, retries=0)
    real1, probes1 = c1._request, []

    def junk(path, body=None):
        if path == "/v1/spec":
            probes1.append(path)
            return b"null"
        return real1(path, body)

    c1._request = junk
    np.testing.assert_allclose(c1.predict(x), x.sum(axis=(1, 2)))
    np.testing.assert_allclose(c1.predict(x), x.sum(axis=(1, 2)))
    assert len(probes1) == 1

    # (b) transient failure: re-probed next predict (once per call, not
    # once per internal helper), then recovery restores chunking state
    c2 = ServingClient(live_loop, timeout_s=60, retries=0)
    real2, probes2 = c2._request, []
    flaky_state = {"down": True}

    def flaky(path, body=None):
        if path == "/v1/spec":
            probes2.append(path)
            if flaky_state["down"]:
                raise RetryableError(0, "blip")
        return real2(path, body)

    c2._request = flaky
    np.testing.assert_allclose(c2.predict(x), x.sum(axis=(1, 2)))
    assert len(probes2) == 1  # one probe for the whole predict() call
    flaky_state["down"] = False
    np.testing.assert_allclose(c2.predict(x), x.sum(axis=(1, 2)))
    assert len(probes2) == 2 and isinstance(c2._spec, dict)  # recovered

    # (c) no widening: float16 -> float32 daemon ships float16 untouched
    c3 = ServingClient(live_loop, timeout_s=60)
    spec = c3.spec()
    assert spec["max_request_samples"] == 16 * spec["max_batch"]
    xh = np.ones((2, 4, 4), np.float16)
    assert c3._coerce(xh, spec).dtype == np.float16
    np.testing.assert_allclose(c3.predict(xh), [16.0, 16.0])
    # ...and float64 still downcasts (2x fewer wire bytes)
    assert c3._coerce(np.ones((2, 4, 4), np.float64), spec).dtype \
        == np.float32


def test_dump_config_atomic_on_unserializable(tmp_path):
    """A failed dump leaves NO file at the target path (crash-atomicity
    is exercised via the serialize-first + temp-rename path)."""
    import pytest as _pytest
    import yaml as _yaml

    from protoasnet_tpu.utils.config import dump_config

    p = tmp_path / "c.yml"
    with _pytest.raises(_yaml.YAMLError):
        dump_config({"bad": object()}, str(p))
    assert not p.exists()
    assert not list(tmp_path.iterdir())  # no temp litter either

    dump_config({"ok": 1}, str(p))
    assert _yaml.safe_load(p.read_text()) == {"ok": 1}


def test_http_fuzz_garbage_bodies_never_5xx(http_server):
    """Adversarial wire fuzz: random byte salads, truncated npy headers,
    wrong ranks/dtypes, pickled-object npys — every one must be a 4xx
    client error (never a 5xx retryable, never a hang, never a poisoned
    next request)."""
    url, _ = http_server
    rng = np.random.default_rng(99)

    def npy_bytes(arr):
        buf = io.BytesIO()
        np.save(buf, arr)
        return buf.getvalue()

    good = npy_bytes(np.ones((2, 4, 4), np.float32))
    bodies = [
        rng.bytes(64),                      # random garbage
        b"\x93NUMPY" + rng.bytes(40),       # magic then garbage
        good[: len(good) // 2],             # truncated real npy
        npy_bytes(np.ones((2, 4, 4), np.complex64)),   # unsafe dtype
        npy_bytes(np.ones((2, 3, 3), np.float32))[:-7],  # short payload
        npy_bytes(np.array(["a", "b"])),    # non-numeric
        npy_bytes(np.ones((2,), np.float32)),            # rank too low
        npy_bytes(np.ones((1, 2, 4, 4, 2), np.float32)),  # rank too high
    ]
    for i, body in enumerate(bodies):
        req = urllib.request.Request(url + "/v1/predict", data=body,
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=15)
        assert 400 <= ei.value.code < 500, \
            f"body {i}: got {ei.value.code}, want 4xx"
        # the daemon must still be healthy and serve the NEXT request
        out = _post_npy(url + "/v1/predict",
                        np.ones((1, 4, 4), np.float32))
        np.testing.assert_allclose(out, [16.0])


def test_http_missing_negative_or_chunked_content_length_is_400(http_server):
    """Header-level protocol abuse: no Content-Length, a negative one
    (which would turn rfile.read into a thread-pinning read-to-EOF), or
    chunked transfer-encoding must all be 400 + connection close — never
    a hang, never a keep-alive desync."""
    import http.client as hc
    from urllib.parse import urlparse

    url, _ = http_server
    u = urlparse(url)

    for headers in ({}, {"Content-Length": "-5"},
                    {"Content-Length": "nope"},
                    {"Transfer-Encoding": "chunked"}):
        conn = hc.HTTPConnection(u.hostname, u.port, timeout=10)
        try:
            conn.putrequest("POST", "/v1/predict")
            for k, v in headers.items():
                conn.putheader(k, v)
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == 400, (headers, resp.status)
            assert resp.getheader("Connection") == "close"
        finally:
            conn.close()


def test_batcher_rejects_empty_batch():
    b = DynamicBatcher(_identity_sum, max_batch=4, max_delay_ms=1.0)
    try:
        with pytest.raises(ValueError, match="empty batch"):
            b.submit(np.ones((0, 2, 2), np.float32))
        with pytest.raises(ValueError, match="empty batch"):
            b.submit_many(np.ones((0, 2, 2), np.float32))
    finally:
        b.close()


def test_http_empty_npy_batch_is_400(http_server):
    url, _ = http_server
    req = urllib.request.Request(
        url + "/v1/predict", method="POST",
        data=(lambda b: (np.save(b, np.ones((0, 4, 4), np.float32)),
                         b.getvalue())[1])(io.BytesIO()))
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400


# -- weight hot-swap (server.Reloader + /v1/reload) --------------------------


def _post_json(url, obj, timeout=30):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        body = e.read()
        try:
            return e.code, json.loads(body)
        except ValueError:
            return e.code, {"raw": body.decode("utf-8", "replace")}


def _get_json(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


def _wait_reload(url, want_gen, timeout=120):
    deadline = time.time() + timeout
    st = None
    while time.time() < deadline:
        st = _get_json(url + "/v1/reload")
        if st["state"] == "error":
            return st
        if st["generation"] >= want_gen and st["state"] == "serving":
            return st
        time.sleep(0.05)
    raise AssertionError(f"reload never reached generation {want_gen}: {st}")


@pytest.fixture()
def reload_loop(tmp_path):
    """_serve_loop with /v1/reload enabled. The 'checkpoint' format is a
    text file holding a scale factor (jitted per-sample sum * scale), so a
    swap visibly changes outputs; a negative scale simulates a checkpoint
    whose model geometry breaks the serving contract. reload_root is
    tmp_path; yields (base_url, tmp_path, outside_file, build_calls)."""
    import jax
    import jax.numpy as jnp

    from protoasnet_tpu.server import _serve_loop

    (tmp_path / "w1.txt").write_text("1.0")
    (tmp_path / "w3.txt").write_text("3.0")
    (tmp_path / "w_badshape.txt").write_text("-1.0")
    outside = tmp_path.parent / f"outside_{tmp_path.name}.txt"
    outside.write_text("9.0")
    calls = []

    def build(target, int8):
        calls.append((target, int8))
        scale = float(open(target).read())
        shape = (5, 5) if scale < 0 else (4, 4)
        return (jax.jit(lambda x: jnp.sum(x, axis=(1, 2)) * scale),
                shape, np.float32)

    jit1, shape, dtype = build(str(tmp_path / "w1.txt"), False)
    calls.clear()

    def fn(x):
        return np.asarray(jit1(x), np.float32)

    ready, stop = threading.Event(), threading.Event()
    t = threading.Thread(
        target=_serve_loop,
        args=(fn, shape, dtype, "127.0.0.1", 0, 4, 2.0, False, ready),
        kwargs=dict(stop_event=stop, reload_build=build,
                    reload_root=str(tmp_path)),
        daemon=True)
    t.start()
    assert ready.wait(60)
    yield f"http://127.0.0.1:{ready.port}", tmp_path, outside, calls
    stop.set()
    t.join(timeout=30)
    assert not t.is_alive()


def test_reload_disabled_is_403(live_loop):
    """Daemons started without --allow_reload must refuse both verbs (the
    endpoint takes filesystem paths from the network; Reloader docstring)."""
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(live_loop + "/v1/reload", timeout=10)
    assert ei.value.code == 403
    code, _ = _post_json(live_loop + "/v1/reload", {"target": "x"})
    assert code == 403


def test_reload_hot_swap_changes_weights(reload_loop):
    """POST /v1/reload compiles the new weights in the background and
    atomically swaps: same daemon, same socket, new outputs."""
    url, root, _, calls = reload_loop
    x = np.random.default_rng(0).normal(size=(3, 4, 4)).astype(np.float32)
    ref = x.sum(axis=(1, 2))
    np.testing.assert_allclose(_post_npy(url + "/v1/predict", x), ref,
                               rtol=1e-5)

    st = _get_json(url + "/v1/reload")
    assert st["state"] == "idle" and st["generation"] == 0
    assert st["root"] == str(root)

    code, body = _post_json(url + "/v1/reload",
                            {"target": str(root / "w3.txt"), "int8": True})
    assert code == 202, body
    st = _wait_reload(url, 1)
    assert st["state"] == "serving" and st["error"] is None
    np.testing.assert_allclose(_post_npy(url + "/v1/predict", x), 3 * ref,
                               rtol=1e-5)
    # the explicit int8 flag rode through to the build closure
    assert calls == [(str(root / "w3.txt"), True)]
    # reload status also rides /v1/stats for one-stop scraping
    assert _get_json(url + "/v1/stats")["reload"]["generation"] == 1


def test_reload_rejects_bad_targets(reload_loop):
    """Path escapes and missing targets are 400 at request time (nothing
    kicked off); malformed JSON bodies too. Traffic keeps flowing."""
    url, root, outside, calls = reload_loop
    code, body = _post_json(url + "/v1/reload", {"target": str(outside)})
    assert code == 400 and "outside" in body["error"]
    # ../ escape resolved by realpath, not string-prefix tricks
    code, body = _post_json(
        url + "/v1/reload", {"target": str(root / ".." / outside.name)})
    assert code == 400 and "outside" in body["error"]
    code, body = _post_json(url + "/v1/reload",
                            {"target": str(root / "nope.txt")})
    assert code == 400 and "does not exist" in body["error"]
    code, _ = _post_json(url + "/v1/reload", {"not_target": 1})
    assert code == 400
    assert calls == []  # none of those reached the build
    x = np.ones((2, 4, 4), np.float32)
    np.testing.assert_allclose(_post_npy(url + "/v1/predict", x),
                               x.sum(axis=(1, 2)), rtol=1e-6)


def test_reload_failure_keeps_old_weights(reload_loop):
    """A reload that blows up mid-build (corrupt checkpoint, or a model
    whose input geometry breaks the published serving contract) parks the
    error in status and the OLD weights keep serving; the busy flag is
    released so a later good reload succeeds."""
    url, root, _, _ = reload_loop
    (root / "corrupt.txt").write_text("not-a-float")
    for target, want in [("corrupt.txt", "ValueError"),
                         ("w_badshape.txt", "serving contract")]:
        code, _ = _post_json(url + "/v1/reload",
                             {"target": str(root / target)})
        assert code == 202
        deadline = time.time() + 60
        st = None
        while time.time() < deadline:
            st = _get_json(url + "/v1/reload")
            if st["state"] == "error":
                break
            time.sleep(0.05)
        assert st["state"] == "error" and want in st["error"], st
        assert st["generation"] == 0
        x = np.ones((2, 4, 4), np.float32)
        np.testing.assert_allclose(_post_npy(url + "/v1/predict", x),
                                   x.sum(axis=(1, 2)), rtol=1e-6)
    code, _ = _post_json(url + "/v1/reload", {"target": str(root / "w3.txt")})
    assert code == 202
    assert _wait_reload(url, 1)["state"] == "serving"


def test_reload_in_flight_requests_served_by_one_weight_set():
    """The swap contract (Reloader docstring): requests racing a reload are
    never dropped and each is served entirely by old OR new weights — the
    dispatch thread reads batcher.fn once per flushed group, and the swap
    is a single atomic attribute store. Also pins the 409-while-busy rule."""
    import jax
    import jax.numpy as jnp

    from protoasnet_tpu.server import Reloader

    b = DynamicBatcher(_identity_sum, max_batch=4, max_delay_ms=0.5,
                       dtype=np.float32, sample_shape=(4, 4))
    hold = threading.Event()

    def build(target, int8):
        hold.wait(30)  # stretch the compile window across live traffic
        return (jax.jit(lambda x: jnp.sum(x, axis=(1, 2)) * 3.0),
                (4, 4), np.float32)

    r = Reloader(b, build, root="/")
    results, res_lock = [], threading.Lock()
    stop_traffic = threading.Event()

    def client(i):
        rng = np.random.default_rng(i)
        while not stop_traffic.is_set():
            x = rng.uniform(0.5, 1.5, size=(2, 4, 4)).astype(np.float32)
            ratio = b.submit(x) / x.sum(axis=(1, 2))  # sums >= 8: stable
            with res_lock:
                results.append(ratio)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    try:
        for t in threads:
            t.start()
        code, _ = r.request("/", None)
        assert code == 202
        code2, body2 = r.request("/", None)  # one reload at a time
        assert code2 == 409 and "in progress" in body2["error"]
        time.sleep(0.3)  # traffic against old weights while "compiling"
        assert r.status()["state"] in ("loading", "compiling")
        hold.set()
        deadline = time.time() + 60
        while r.status()["generation"] < 1 and time.time() < deadline:
            time.sleep(0.02)
        assert r.status()["generation"] == 1
        time.sleep(0.3)  # traffic against new weights
    finally:
        stop_traffic.set()
        for t in threads:
            t.join(timeout=30)
        b.close()
    flat = np.concatenate(results)
    old = np.isclose(flat, 1.0, rtol=1e-4)
    new = np.isclose(flat, 3.0, rtol=1e-4)
    assert np.all(old | new), "a request saw a mixed/garbled weight set"
    assert old.any() and new.any(), "swap window not actually exercised"


def test_reload_root_slash_accepts_targets_under_it(tmp_path):
    """Regression: with --reload_root / the containment prefix used to be
    root + sep == '//', which no absolute target starts with — every
    reload was rejected 400 'outside the reload root'. A target UNDER /
    must be accepted (the in-flight test above only covers target ==
    root). Also pins the 202-body contract: it is the PRE-start snapshot
    (state 'loading'), not a racy post-start status() read."""
    import jax
    import jax.numpy as jnp

    from protoasnet_tpu.server import Reloader

    b = DynamicBatcher(_identity_sum, max_batch=4, max_delay_ms=0.5,
                       dtype=np.float32, sample_shape=(4, 4))

    def build(target, int8):
        return (jax.jit(lambda x: jnp.sum(x, axis=(1, 2))),
                (4, 4), np.float32)

    r = Reloader(b, build, root="/")
    try:
        w = tmp_path / "w.txt"
        w.write_text("1.0")
        code, body = r.request(str(w), None)
        assert code == 202, body
        assert body["state"] == "loading" and body["generation"] == 0
        deadline = time.time() + 60
        while (r.status()["state"] not in ("serving", "error")
               and time.time() < deadline):
            time.sleep(0.02)
        st = r.status()
        assert st["state"] == "serving" and st["generation"] == 1, st
    finally:
        b.close()


def test_client_reload_helper(reload_loop, live_loop):
    """ServingClient.reload drives the full hot-swap from the client
    library: POST + poll-to-generation, server-side failure surfaced as
    ServingError (old weights keep serving), 403 on a reload-disabled
    daemon as BadRequestError, and the --reload CLI path."""
    from protoasnet_tpu import client as client_mod
    from protoasnet_tpu.client import (BadRequestError, ServingClient,
                                       ServingError)

    url, root, _, _ = reload_loop
    c = ServingClient(url, timeout_s=60, retries=0)

    st = c.reload_status()
    assert st["state"] == "idle" and st["generation"] == 0

    x = np.random.default_rng(0).normal(size=(2, 4, 4)).astype(np.float32)
    np.testing.assert_allclose(c.predict(x), x.sum(axis=(1, 2)), rtol=1e-5)
    st = c.reload(str(root / "w3.txt"), poll_s=0.05)
    assert st["state"] == "serving" and st["generation"] == 1
    np.testing.assert_allclose(c.predict(x), 3 * x.sum(axis=(1, 2)),
                               rtol=1e-5)

    # a build that fails server-side raises but leaves the daemon serving
    (root / "corrupt.txt").write_text("not-a-float")
    with pytest.raises(ServingError, match="failed server-side"):
        c.reload(str(root / "corrupt.txt"), poll_s=0.05)
    np.testing.assert_allclose(c.predict(x), 3 * x.sum(axis=(1, 2)),
                               rtol=1e-5)
    # bad target is a 400 -> BadRequestError before anything kicks off
    with pytest.raises(BadRequestError):
        c.reload(str(root / "nope.txt"))

    # wait=False returns the 202 acceptance body immediately
    acc = c.reload(str(root / "w1.txt"), wait=False)
    assert acc["state"] == "loading"
    assert _wait_reload(url, 2)["generation"] == 2

    # CLI: --reload round trip (back to w3) without --input
    client_mod.main(["--url", url, "--reload", str(root / "w3.txt")])
    np.testing.assert_allclose(c.predict(x), 3 * x.sum(axis=(1, 2)),
                               rtol=1e-5)

    # reload-disabled daemon: 403 is non-retryable
    c2 = ServingClient(live_loop, timeout_s=30, retries=0)
    with pytest.raises(BadRequestError) as ei:
        c2.reload_status()
    assert ei.value.status == 403
    with pytest.raises(BadRequestError):
        c2.reload("/anything")
