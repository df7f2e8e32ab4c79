"""Serving daemon: dynamic batching over a loaded bundle, HTTP front end.

The reference ships no serving story (train/eval scripts only,
`main.py:18-59`); `serve.py` added the export/predict loop, and this module
closes the deployment picture with a long-running server.

TPU-shaped design decisions:

- **One dispatch thread.** All jax calls happen on the batcher's single
  worker thread; HTTP handler threads only do numpy + queue ops. This is
  the same rule the data loader obeys (CLAUDE.md): a second jax-dispatching
  thread degrades relay/PCIe throughput badly, and single-dispatch keeps
  the device queue ordered so latency is predictable.
- **Bucketed batch shapes.** Even a shape-polymorphic export compiles one
  XLA executable per concrete batch size, so arbitrary request sizes would
  compile-storm the server. Requests are coalesced and padded up to a
  fixed bucket ladder (powers of two up to ``max_batch``); the compile set
  is finite and can be fully warmed at startup (``warmup=True``).
- **Delay-window coalescing.** The dispatcher blocks for the first
  request, then drains the queue for at most ``max_delay_ms`` or until
  ``max_batch`` samples are gathered — at high offered load batches ride
  at the chip's serving sweet spot (128 on v5e, BASELINE.md) with zero
  added latency, at low load a lone request pays at most the delay window.

Usage:
    python -m protoasnet_tpu.server --bundle model.bundle --port 8300
    python -m protoasnet_tpu.server --run_dir <trained run>  \
        [--uint8_input] [--int8]      # live, data-parallel over the mesh
    # POST /v1/predict   body = .npy bytes (b, [T,] H, W[, 3]) -> .npy logits
    # GET  /healthz      liveness
    # GET  /v1/stats     batching/latency counters (JSON)
    # GET  /metrics      the same counters in Prometheus text format
    # POST /v1/reload    {"target": <path>} — hot-swap weights (--allow_reload)
    # GET  /v1/reload    reload state machine status (JSON)
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["DynamicBatcher", "BatcherStats", "make_handler", "serve_forever",
           "serve_live", "prometheus_text", "Reloader"]


def prometheus_text(snapshot: dict, healthy: bool) -> str:
    """Render a ``BatcherStats.snapshot()`` as Prometheus exposition text.

    Dependency-free (no prometheus_client): the v0.0.4 text format is
    lines of ``# TYPE``/``# HELP`` + ``name{labels} value``. Served at
    GET /metrics so a standard Prometheus/Grafana scrape works against
    the daemon out of the box; /v1/stats stays the JSON twin.
    """
    lines: List[str] = []

    def metric(name, mtype, help_, value, labels=""):
        lines.append(f"# HELP protoasnet_{name} {help_}")
        lines.append(f"# TYPE protoasnet_{name} {mtype}")
        if value is not None:
            lines.append(f"protoasnet_{name}{labels} {value}")

    metric("healthy", "gauge", "1 while the dispatch thread is alive",
           1 if healthy else 0)
    metric("requests_total", "counter", "predict requests accepted",
           snapshot["requests"])
    metric("samples_total", "counter", "real samples computed",
           snapshot["samples"])
    metric("batches_total", "counter", "device batches dispatched",
           snapshot["batches"])
    metric("errors_total", "counter", "requests failed in compute",
           snapshot["errors"])
    metric("abandoned_total", "counter",
           "requests that timed out before compute", snapshot["abandoned"])
    metric("padding_fraction", "gauge",
           "fraction of device slots wasted on bucket padding",
           snapshot["padding_frac"])
    if snapshot.get("mean_batch") is not None:
        metric("mean_batch_size", "gauge", "real samples per device batch",
               round(snapshot["mean_batch"], 4))
    # latency percentiles over the recent-request ring buffer, exposed as
    # a summary (quantile-labelled gauges — a true histogram would need
    # fixed buckets chosen before the model's batch curve is known)
    lines.append("# HELP protoasnet_request_latency_ms request latency "
                 "summary over the last 4096 requests")
    lines.append("# TYPE protoasnet_request_latency_ms summary")
    for q, key in (("0.5", "latency_ms_p50"), ("0.95", "latency_ms_p95"),
                   ("0.99", "latency_ms_p99")):
        v = snapshot.get(key)
        if v is not None:
            lines.append(f'protoasnet_request_latency_ms{{quantile="{q}"}} '
                         f"{v}")
    # _count/_sum: quantiles are over the 4096-deep ring, but count/sum are
    # exact running totals — required by strict OpenMetrics summary parsers
    lines.append("protoasnet_request_latency_ms_count "
                 f"{snapshot.get('latency_ms_count', 0)}")
    lines.append("protoasnet_request_latency_ms_sum "
                 f"{snapshot.get('latency_ms_sum', 0.0)}")
    lines.append("# HELP protoasnet_batches_by_bucket_total device batches "
                 "per bucket size")
    lines.append("# TYPE protoasnet_batches_by_bucket_total counter")
    for bucket, count in snapshot["bucket_counts"].items():
        lines.append(f'protoasnet_batches_by_bucket_total{{bucket="{bucket}"}}'
                     f" {count}")
    return "\n".join(lines) + "\n"


def _bucket_ladder(max_batch: int) -> Tuple[int, ...]:
    """1, 2, 4, ... up to and including max_batch."""
    out = []
    b = 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return tuple(out)


class BatcherStats:
    """Lock-protected counters; snapshot() returns a JSON-safe dict."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests = 0
        self.samples = 0
        self.batches = 0
        self.padded_samples = 0  # wasted slots from bucket padding
        self.errors = 0
        self.abandoned = 0  # timed-out requests dropped before compute
        self.bucket_counts: dict = {}
        self._lat_ms: List[float] = []  # ring buffer of request latencies
        # running totals over ALL requests (not just the ring) so the
        # Prometheus summary can emit the _count/_sum series strict
        # OpenMetrics parsers require alongside the quantile samples
        self.lat_count = 0
        self.lat_sum_ms = 0.0

    def record_batch(self, n_real: int, bucket: int, lat_ms: Sequence[float]):
        with self._lock:
            self.batches += 1
            self.samples += n_real
            self.padded_samples += bucket - n_real
            self.bucket_counts[bucket] = self.bucket_counts.get(bucket, 0) + 1
            self.lat_count += len(lat_ms)
            self.lat_sum_ms += float(sum(lat_ms))
            self._lat_ms.extend(lat_ms)
            if len(self._lat_ms) > 4096:
                self._lat_ms = self._lat_ms[-4096:]

    def record_request(self):
        with self._lock:
            self.requests += 1

    def record_error(self):
        with self._lock:
            self.errors += 1

    def record_abandoned(self):
        with self._lock:
            self.abandoned += 1

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._lat_ms)
            pct = (lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]
                   if lat else None)
            return {
                "requests": self.requests,
                "samples": self.samples,
                "batches": self.batches,
                "mean_batch": (self.samples / self.batches
                               if self.batches else None),
                "padding_frac": (self.padded_samples /
                                 max(1, self.samples + self.padded_samples)),
                "errors": self.errors,
                "abandoned": self.abandoned,
                "bucket_counts": {str(k): v
                                  for k, v in sorted(self.bucket_counts.items())},
                "latency_ms_p50": pct(0.50),
                "latency_ms_p95": pct(0.95),
                "latency_ms_p99": pct(0.99),
                "latency_ms_count": self.lat_count,
                "latency_ms_sum": round(self.lat_sum_ms, 3),
            }


class _Pending:
    __slots__ = ("x", "event", "result", "error", "t_submit", "abandoned")

    def __init__(self, x: np.ndarray):
        self.x = x              # (n, ...) batcher dtype, n >= 1
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None
        self.t_submit = time.monotonic()
        self.abandoned = False  # waiter gave up; skip compute if not started


class DynamicBatcher:
    """Coalesce concurrent requests into bucketed batches on ONE thread.

    fn: the model function, e.g. ``serve.load_serving_bundle(path)`` —
        called as ``fn(x)`` with x ``dtype`` (bucket, *sample_shape); must
        return per-sample outputs with leading dim == bucket. Called only
        from the dispatch thread.
    sample_shape: optional per-sample shape; when set, submit() rejects
        mismatched requests instead of letting one bad request poison the
        whole coalesced batch.
    """

    def __init__(self, fn: Callable, max_batch: int = 128,
                 max_delay_ms: float = 5.0,
                 buckets: Optional[Sequence[int]] = None,
                 dtype=np.float32,
                 sample_shape: Optional[Sequence[int]] = None):
        assert max_batch >= 1
        self.fn = fn
        self.dtype = np.dtype(dtype)  # uint8 for --uint8_input bundles
        self.sample_shape = tuple(sample_shape) if sample_shape else None
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self.buckets = tuple(sorted(buckets)) if buckets else \
            _bucket_ladder(self.max_batch)
        assert self.buckets[-1] >= self.max_batch
        self.stats = BatcherStats()
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._closed = False
        self._fatal: Optional[BaseException] = None
        # dispatch-thread-only: the group currently being coalesced/served,
        # so the _run guard can fail its waiters if the thread dies
        self._current_group: List[_Pending] = []
        self._close_lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="batcher-dispatch")
        self._thread.start()

    # -- client side --------------------------------------------------------

    def _validate(self, x: np.ndarray) -> np.ndarray:
        if x.ndim < 2:
            raise ValueError("expected a batched array (n, ...)")
        if len(x) == 0:
            # fail loudly; downstream np.concatenate([]) would otherwise
            # produce a baffling "need at least one array" error
            raise ValueError("empty batch (0 samples)")
        if self.sample_shape is not None and x.shape[1:] != self.sample_shape:
            raise ValueError(f"sample shape {x.shape[1:]} != model input "
                             f"{self.sample_shape}")
        if not np.can_cast(x.dtype, self.dtype, casting="same_kind"):
            # e.g. float clips posted to a uint8 daemon would silently
            # truncate to garbage; uint8 -> float32 upcasts are fine
            raise ValueError(f"dtype {x.dtype} not safely castable to model "
                             f"input {self.dtype}")
        return np.ascontiguousarray(x, dtype=self.dtype)

    def _enqueue(self, x: np.ndarray) -> _Pending:
        p = _Pending(x)
        # lock orders the closed-check against close(): a put that won the
        # check lands before the sentinel, so _drain_closed always sees it
        with self._close_lock:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self.stats.record_request()
            self._q.put(p)
        return p

    def _wait(self, p: _Pending, deadline: Optional[float]) -> np.ndarray:
        remaining = None if deadline is None \
            else max(0.0, deadline - time.monotonic())
        if not p.event.wait(remaining):
            p.abandoned = True  # dispatcher drops it if not yet computed
            raise TimeoutError("inference timed out")
        if p.error is not None:
            raise p.error
        return p.result

    def submit(self, x: np.ndarray, timeout: Optional[float] = None
               ) -> np.ndarray:
        """Block until the batch containing ``x`` is served; returns the
        outputs for x's rows. x: (n, *sample_shape), n <= max_batch
        (use submit_many for larger requests)."""
        if len(x) > self.max_batch:
            raise ValueError(f"request batch {len(x)} > max_batch "
                             f"{self.max_batch}; split the request")
        x = self._validate(x)
        deadline = None if timeout is None else time.monotonic() + timeout
        return self._wait(self._enqueue(x), deadline)

    def submit_many(self, x: np.ndarray, timeout: Optional[float] = None
                    ) -> np.ndarray:
        """Any-size request: enqueue ALL max_batch-sized chunks up front
        (so chunk k+1's H2D staging overlaps chunk k's compute), then wait
        for each in order."""
        x = self._validate(x)
        deadline = None if timeout is None else time.monotonic() + timeout
        pendings = [self._enqueue(x[i:i + self.max_batch])
                    for i in range(0, len(x), self.max_batch)]
        try:
            return np.concatenate([self._wait(p, deadline) for p in pendings])
        except BaseException:
            # one chunk failed/timed out: nobody will read the rest of this
            # request, so flag the sibling chunks abandoned too — otherwise
            # the dispatcher spends chip time on dead work while the
            # client's retry queues behind it (overload spiral)
            for p in pendings:
                if not p.event.is_set():
                    p.abandoned = True
            raise

    def close(self):
        with self._close_lock:
            self._closed = True
            self._q.put(None)
        self._thread.join(timeout=10)

    # -- dispatch thread ----------------------------------------------------

    def warmup(self, sample_shape: Optional[Sequence[int]] = None,
               buckets: Optional[Sequence[int]] = None) -> None:
        """Compile every bucket up front (one fn call per bucket) so no
        live request pays a compile. Runs on the caller's thread — call
        before serving traffic."""
        shape = tuple(sample_shape) if sample_shape else self.sample_shape
        assert shape is not None, "warmup needs a sample_shape"
        for b in (buckets or self.buckets):
            x = np.zeros((b, *shape), self.dtype)
            np.asarray(self.fn(x))

    def _pick_bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    @property
    def healthy(self) -> bool:
        """True while the dispatch thread is serving (or cleanly closed).
        False means the thread died on an unexpected error — /healthz
        reports 503 so an orchestrator restarts the daemon."""
        return self._fatal is None

    def _run(self):
        try:
            self._run_inner()
        except BaseException as e:  # noqa: BLE001 — never die silently
            # _flush already contains per-group failures; anything that
            # still escapes here would otherwise zombie the daemon. Fail
            # every queued waiter loudly instead of hanging them, and
            # refuse new submits (fail-fast beats accept-and-hang).
            self._fatal = e
            with self._close_lock:
                self._closed = True
            dead: List[_Pending] = list(self._current_group)
            while True:
                try:
                    p = self._q.get_nowait()
                except queue.Empty:
                    break
                if p is not None:
                    dead.append(p)
            for p in dead:
                if not p.event.is_set():
                    p.error = RuntimeError(f"dispatch thread died: {e!r}")
                    p.event.set()
            raise

    def _run_inner(self):
        while True:
            first = self._q.get()
            if first is None:
                self._drain_closed()
                break
            if first.abandoned:
                self.stats.record_abandoned()
                continue
            group = [first]
            self._current_group = group
            total = len(first.x)
            deadline = time.monotonic() + self.max_delay_s
            # drain until the window closes or the max bucket fills
            while total < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    # grab whatever is already queued, but don't wait more
                    try:
                        nxt = self._q.get_nowait()
                    except queue.Empty:
                        break
                else:
                    try:
                        nxt = self._q.get(timeout=remaining)
                    except queue.Empty:
                        break
                if nxt is None:
                    self._flush(group)
                    self._drain_closed()
                    return
                if nxt.abandoned:
                    self.stats.record_abandoned()
                    continue
                if (total + len(nxt.x) > self.max_batch
                        or nxt.x.shape[1:] != group[0].x.shape[1:]):
                    # doesn't fit (or, without submit-side shape validation,
                    # a different sample shape): serve the current group,
                    # start fresh — one request can't poison another's batch
                    self._flush(group)
                    group, total = [nxt], len(nxt.x)
                    self._current_group = group
                    deadline = time.monotonic() + self.max_delay_s
                    continue
                group.append(nxt)
                total += len(nxt.x)
            self._flush(group)
            self._current_group = []

    def _drain_closed(self):
        """After the shutdown sentinel: fail any requests still queued so
        their waiters don't hang until timeout."""
        while True:
            try:
                p = self._q.get_nowait()
            except queue.Empty:
                return
            if p is not None:
                p.error = RuntimeError("batcher closed")
                p.event.set()

    def _flush(self, group: List[_Pending]):
        # drop requests whose waiter timed out while queued — computing
        # them would spend chip time on work nobody reads (overload spiral)
        live = [p for p in group if not p.abandoned]
        for _ in range(len(group) - len(live)):
            self.stats.record_abandoned()
        group = live
        total = sum(len(p.x) for p in group)
        if not group:
            return
        bucket = self._pick_bucket(total)
        try:
            # the buffer alloc is INSIDE the try: a transient MemoryError
            # on a big bucket must fail this group's waiters, not kill the
            # dispatch thread (which would zombie the whole daemon)
            x = np.zeros((bucket, *group[0].x.shape[1:]), self.dtype)
            ofs = 0
            for p in group:
                x[ofs:ofs + len(p.x)] = p.x
                ofs += len(p.x)
            out = np.asarray(self.fn(x), np.float32)
            t_done = time.monotonic()
            ofs = 0
            lats = []
            for p in group:
                p.result = out[ofs:ofs + len(p.x)]
                ofs += len(p.x)
                lats.append((t_done - p.t_submit) * 1e3)
                p.event.set()
            self.stats.record_batch(total, bucket, lats)
        except BaseException as e:  # noqa: BLE001 — propagate to all waiters
            self.stats.record_error()
            for p in group:
                if not p.event.is_set():
                    p.error = e
                    p.event.set()


class Reloader:
    """Hot-swap the batcher's model function without dropping traffic.

    The reference's only path to new weights is retrain-and-restart
    (`main.py:48-57`); with const-weight serving (+30%, serve.py) a
    restart costs the full warmup recompile with the daemon down. This
    does the expensive work while the OLD weights keep serving:

    - ``build(target, int8)`` (mode-specific closure from serve_live /
      serve_forever) loads the new checkpoint/bundle and returns a
      JITTED fn — no execution yet.
    - the reloader thread then AOT-compiles every bucket via
      ``jitted.lower(spec).compile()``. Lower/compile never dispatches a
      device computation, so through the (long) compile phase the
      batcher's single-dispatch-thread rule (module docstring; CLAUDE.md
      loader rule) holds: the dispatch thread stays the only thread
      *executing* on the device. The LOAD phase is the documented
      exception: ``build`` runs checkpoint restore / model init (and,
      for --int8 reloads, calibration forwards) on this thread, so
      serving throughput dips from the dual-dispatch contention for
      those seconds (worst on relay-attached hosts — CLAUDE.md measured
      3-6x for sustained dual dispatch). Old weights still serve every
      request throughout; the alternative (pausing serving for the load)
      would be a real outage instead of a dip.
    - swap is one attribute store (``batcher.fn = new_fn``) — atomic
      under the GIL, and the dispatch thread reads ``self.fn`` once per
      flushed group, so every request is served entirely by one weight
      set: old until the swap instant, new after. Nothing is dropped.

    Path safety: the daemon binds 0.0.0.0 by default, so an unrestricted
    reload endpoint would let any client point the server at arbitrary
    filesystem paths. Reload is OFF unless the CLI passes
    ``--allow_reload``, and targets must resolve (realpath, so symlinks
    can't escape) under ``root`` — defaulting to the initial artifact's
    parent directory.

    One reload at a time (409 while busy); failures leave the old fn
    serving and park the error in the status JSON (GET /v1/reload).
    """

    def __init__(self, batcher: DynamicBatcher, build: Callable, root: str,
                 default_int8: bool = False):
        import os

        self.batcher = batcher
        self.build = build  # (target, int8) -> (jitted_fn, sample_shape, dtype)
        self.root = os.path.realpath(root)
        self.default_int8 = bool(default_int8)
        self.generation = 0  # completed swaps
        self._lock = threading.Lock()
        self._busy = False
        self._state = {"generation": 0, "state": "idle", "target": None,
                       "error": None}

    def status(self) -> dict:
        with self._lock:
            return dict(self._state, root=self.root)

    def request(self, target: str, int8=None) -> Tuple[int, dict]:
        """Validate + kick off an async reload; returns (http_code, body)."""
        import os

        real = os.path.realpath(target)
        # rstrip so a reload root of "/" yields the prefix "/" (not "//",
        # which would reject every target under it)
        if real != self.root and not real.startswith(
                self.root.rstrip(os.sep) + os.sep):
            return 400, {"error": f"target {target!r} resolves outside the "
                                  f"reload root {self.root!r}"}
        if not os.path.exists(real):
            return 400, {"error": f"target {target!r} does not exist"}
        with self._lock:
            if self._busy:
                return 409, dict(self._state, error="reload in progress")
            self._busy = True
            self._state = {"generation": self.generation, "state": "loading",
                           "target": target, "error": None}
            # snapshot the pre-start state UNDER the lock: once the worker
            # thread starts it may advance (or even complete) the state
            # machine before this method returns, and the 202 body is
            # contractually the PRE-swap status — ServingClient.reload()
            # takes its generation watermark from it
            accepted = dict(self._state, root=self.root)
        threading.Thread(target=self._work, args=(real, int8), daemon=True,
                         name="reloader").start()
        return 202, accepted

    def _work(self, target: str, int8) -> None:
        try:
            import jax

            jitted, sample_shape, dtype = self.build(
                target, self.default_int8 if int8 is None else bool(int8))
            sample_shape = tuple(sample_shape)
            if (sample_shape != self.batcher.sample_shape
                    or np.dtype(dtype) != self.batcher.dtype):
                # the input contract (published via /v1/spec, validated per
                # request) is fixed for the daemon's lifetime — a different
                # model geometry needs a new daemon, not a hot-swap
                raise ValueError(
                    f"new model input {sample_shape}/{np.dtype(dtype).name} "
                    f"!= serving contract {self.batcher.sample_shape}/"
                    f"{self.batcher.dtype.name}")
            with self._lock:
                self._state["state"] = "compiling"
            compiled = {}
            for b in self.batcher.buckets:
                spec = jax.ShapeDtypeStruct((b, *sample_shape), dtype)
                compiled[b] = jitted.lower(spec).compile()

            def fn(x):
                # the batcher always pads groups to a bucket size, so the
                # exact-shape executable always exists
                return np.asarray(compiled[len(x)](x), np.float32)

            self.batcher.fn = fn  # THE swap: one atomic attribute store
            with self._lock:
                self.generation += 1
                self._state.update(state="serving",
                                   generation=self.generation)
                self._busy = False
        except BaseException as e:  # noqa: BLE001 — old weights keep serving
            with self._lock:
                self._state.update(state="error",
                                   error=f"{type(e).__name__}: {e}")
                self._busy = False


# --- HTTP front end ---------------------------------------------------------


class _Inflight:
    """Counts requests a handler thread has accepted but not finished, so
    shutdown can wait for them: ThreadingHTTPServer marks handler threads
    daemon, which server_close() deliberately does NOT join — without
    this, stop_event teardown would close the batcher under a request
    that was fully received but not yet enqueued (client sees a 503/cut
    connection for work the daemon accepted)."""

    def __init__(self):
        self._n = 0
        self._cv = threading.Condition()

    def __enter__(self):
        with self._cv:
            self._n += 1

    def __exit__(self, *a):
        with self._cv:
            self._n -= 1
            self._cv.notify_all()

    def wait_idle(self, timeout: float) -> bool:
        deadline = time.monotonic() + timeout
        with self._cv:
            while self._n:
                left = deadline - time.monotonic()
                if left <= 0:
                    return False
                self._cv.wait(left)
            return True


def make_handler(batcher: DynamicBatcher, sample_ndim: int,
                 timeout_s: float = 60.0,
                 max_body_bytes: int = 256 << 20,
                 reloader: Optional[Reloader] = None):
    """BaseHTTPRequestHandler subclass bound to ``batcher``.

    sample_ndim: rank WITHOUT batch (4 for video (T,H,W,3), 3 for image).
    Accepts request bodies with or without the batch dim.
    max_body_bytes: reject larger payloads with 413 before reading them
    (the daemon binds 0.0.0.0 by default — an unbounded Content-Length
    would let any client OOM the serving host).
    reloader: enables POST/GET /v1/reload weight hot-swap; None (default)
    keeps the endpoint 403 (see Reloader's path-safety rationale)."""
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        # socket read timeout: a client that sends Content-Length and then
        # stalls would otherwise pin a handler thread forever (slow-loris
        # thread exhaustion); BaseHTTPRequestHandler applies this to the
        # connection and treats a timeout as close_connection
        timeout = 120.0
        inflight = _Inflight()

        def log_message(self, *a):  # quiet by default
            pass

        def _send(self, code: int, body: bytes,
                  ctype: str = "application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            if self.close_connection:
                # tell the client too (set before _send, e.g. the 413
                # path, where the unread body would desync keep-alive)
                self.send_header("Connection", "close")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                if batcher.healthy:
                    self._send(200, b"ok", "text/plain")
                else:
                    self._send(503, b"dispatch thread dead", "text/plain")
            elif self.path == "/v1/stats":
                snap = batcher.stats.snapshot()
                if reloader is not None:
                    snap["reload"] = reloader.status()
                self._send(200, json.dumps(snap).encode(), "application/json")
            elif self.path == "/v1/reload":
                if reloader is None:
                    self._send(403, b"reload disabled (start the daemon "
                               b"with --allow_reload)", "text/plain")
                else:
                    self._send(200, json.dumps(
                        reloader.status()).encode(), "application/json")
            elif self.path == "/metrics":
                body = prometheus_text(batcher.stats.snapshot(),
                                       batcher.healthy).encode()
                self._send(200, body,
                           "text/plain; version=0.0.4; charset=utf-8")
            elif self.path == "/v1/spec":
                # input contract discovery (client.ServingClient): lets a
                # client validate/encode locally (esp. uint8 daemons) and
                # size chunks to the body cap without a rejected probe
                self._send(200, json.dumps({
                    "sample_shape": list(batcher.sample_shape)
                    if batcher.sample_shape else None,
                    "dtype": batcher.dtype.name,
                    "max_batch": batcher.max_batch,
                    "buckets": list(batcher.buckets),
                    "max_body_bytes": max_body_bytes,
                    # explicit per-request sample ceiling so clients don't
                    # have to mirror the body-cap sizing heuristic
                    "max_request_samples": 16 * batcher.max_batch,
                }).encode(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path == "/v1/reload":
                self._do_reload()
                return
            if self.path != "/v1/predict":
                self._send(404, b"not found", "text/plain")
                return
            with self.inflight:
                self._do_predict()

        def _do_reload(self):
            if reloader is None:
                self._send(403, b"reload disabled (start the daemon with "
                           b"--allow_reload)", "text/plain")
                return
            cl = self.headers.get("Content-Length")
            try:
                n = int(cl) if cl is not None else -1
            except ValueError:
                n = -1
            if not 0 <= n <= (64 << 10):  # control-plane body: tiny JSON
                self.close_connection = True
                self._send(400, b"Content-Length required (<= 64 KiB JSON)",
                           "text/plain")
                return
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
                target = body["target"]
            except (ValueError, KeyError, TypeError) as e:
                self._send(400, f'expected {{"target": <path>}} JSON: '
                           f"{e!r}".encode(), "text/plain")
                return
            code, resp = reloader.request(str(target), body.get("int8"))
            self._send(code, json.dumps(resp).encode(), "application/json")

        def _do_predict(self):
            try:
                # Content-Length must exist and be a non-negative int:
                # chunked bodies have none (the unread body would desync
                # keep-alive), and a negative value would turn rfile.read
                # into read-to-EOF — a handler thread pinned until the
                # peer hangs up
                te = self.headers.get("Transfer-Encoding")
                cl = self.headers.get("Content-Length")
                if te or cl is None:
                    self.close_connection = True
                    self._send(400, b"Content-Length required "
                               b"(chunked bodies unsupported)", "text/plain")
                    return
                try:
                    n = int(cl)
                except ValueError:
                    n = -1
                if n < 0:
                    self.close_connection = True
                    self._send(400, f"bad Content-Length {cl!r}".encode(),
                               "text/plain")
                    return
                if n > max_body_bytes:
                    # the body was NOT read: close the connection, or a
                    # keep-alive client's unread npy bytes get parsed as
                    # the next request line (connection desync)
                    self.close_connection = True
                    self._send(413, f"body {n} bytes > limit "
                               f"{max_body_bytes}".encode(), "text/plain")
                    return
                try:
                    x = np.load(io.BytesIO(self.rfile.read(n)),
                                allow_pickle=False)
                except Exception as e:
                    # np.load raises EOFError/OSError/... on truncated or
                    # empty bodies — all client-side payload problems (400),
                    # not retryable server faults (503)
                    raise ValueError(f"bad .npy payload: {e}") from None
                if x.ndim == sample_ndim:
                    x = x[None]
                if x.ndim != sample_ndim + 1:
                    raise ValueError(
                        f"expected rank {sample_ndim} or {sample_ndim + 1}, "
                        f"got {x.ndim}")
                out = batcher.submit_many(x, timeout=timeout_s)
                buf = io.BytesIO()
                np.save(buf, out)
                self._send(200, buf.getvalue())
            except TimeoutError as e:
                # server overload/stall, not the client's fault: retryable
                self._send(504, f"{type(e).__name__}: {e}".encode(),
                           "text/plain")
            except ValueError as e:  # bad payload (np.load, rank, shape,
                self._send(400, f"{type(e).__name__}: {e}".encode(),  # dtype)
                           "text/plain")
            except Exception as e:  # noqa: BLE001 — model/server fault
                self._send(503, f"{type(e).__name__}: {e}".encode(),
                           "text/plain")

    return Handler


def _serve_loop(fn, sample_shape, dtype, host, port, max_batch,
                max_delay_ms, warmup, ready_event, buckets=None,
                banner="", stop_event=None, reload_build=None,
                reload_root=None, reload_int8=False):
    """ready_event (optional): set once the socket is bound; the bound
    port is published as ``ready_event.port`` (useful with port=0).
    stop_event (optional): setting it shuts the server down cleanly —
    the test/embedding hook, since serve_forever() otherwise only exits
    on KeyboardInterrupt.
    reload_build (optional): mode-specific ``(target, int8) -> (jitted,
    sample_shape, dtype)`` closure; enables the /v1/reload hot-swap
    endpoint rooted at ``reload_root``."""
    from http.server import ThreadingHTTPServer

    batcher = DynamicBatcher(fn, max_batch=max_batch,
                             max_delay_ms=max_delay_ms, dtype=dtype,
                             buckets=buckets, sample_shape=sample_shape)
    if warmup:
        t0 = time.monotonic()
        batcher.warmup()
        print(f"warmed {len(batcher.buckets)} buckets "
              f"{batcher.buckets} in {time.monotonic() - t0:.1f}s")
    sample_bytes = int(np.prod(sample_shape)) * np.dtype(dtype).itemsize
    reloader = None
    if reload_build is not None:
        reloader = Reloader(batcher, reload_build, reload_root,
                            default_int8=reload_int8)
    handler_cls = make_handler(
        batcher, sample_ndim=len(sample_shape),
        # npy header is tiny; allow 16 full batches per request
        max_body_bytes=16 * max_batch * sample_bytes + (1 << 20),
        reloader=reloader)
    httpd = ThreadingHTTPServer((host, port), handler_cls)
    if ready_event is not None:
        ready_event.port = httpd.server_address[1]
        ready_event.set()
    if stop_event is not None:
        threading.Thread(
            target=lambda: (stop_event.wait(), httpd.shutdown()),
            daemon=True, name="server-stop").start()
    print(f"serving {banner} on {host}:{httpd.server_address[1]} "
          f"(max_batch={max_batch}, window={max_delay_ms}ms, "
          f"input dtype {np.dtype(dtype).name})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        # handler threads are daemons (server_close doesn't join them):
        # wait for requests already ACCEPTED to finish before closing the
        # batcher, or a request received moments before shutdown gets a
        # 503 for work the daemon took responsibility for. Bounded by the
        # handler's submit timeout; stragglers past it fail loud below.
        if not handler_cls.inflight.wait_idle(65.0):
            print("shutdown: abandoning handler(s) still in flight "
                  "after 65s", flush=True)
        batcher.close()


def serve_forever(bundle_path: str, host: str = "0.0.0.0", port: int = 8300,
                  max_batch: int = 128, max_delay_ms: float = 5.0,
                  warmup: bool = True, ready_event=None, stop_event=None,
                  allow_reload: bool = False, reload_root=None):
    """Serve an exported bundle (single device) until interrupted.

    allow_reload: expose POST /v1/reload {"target": <bundle path under
    reload_root>} to hot-swap to a newly exported bundle (see Reloader).
    """
    import os

    from protoasnet_tpu.serve import load_serving_bundle_with_spec

    fn, shape, dtype = load_serving_bundle_with_spec(bundle_path)

    reload_build = None
    if allow_reload:
        def reload_build(target, int8):
            # a bundle is self-contained (int8 kernels baked into its
            # StableHLO at export), so the int8 flag is ignored here
            import jax

            nfn, nshape, ndtype = load_serving_bundle_with_spec(target)
            return jax.jit(nfn), nshape[1:], ndtype

    _serve_loop(fn, shape[1:], dtype, host, port, max_batch, max_delay_ms,
                warmup, ready_event, banner=bundle_path,
                stop_event=stop_event, reload_build=reload_build,
                reload_root=reload_root or os.path.dirname(
                    os.path.abspath(bundle_path)))


def serve_live(run_dir: str, host: str = "0.0.0.0", port: int = 8300,
               max_batch: int = 128, max_delay_ms: float = 5.0,
               warmup: bool = True, ready_event=None,
               uint8_input: bool = False, int8: bool = False,
               calib_batches: int = 4, stop_event=None,
               allow_reload: bool = False, reload_root=None):
    """Serve a trained run live, data-parallel over ALL local devices.

    Rebuilds the model from the run dir and serves it through
    ``serve.make_sharded_serving_fn``: params replicated, batch sharded
    over the mesh's 'data' axis — zero collectives, throughput additive
    across ICI-connected chips (each chip's shard should sit near its
    128-clip sweet spot, so size --max_batch ~ 128 * n_devices). Bucket
    ladder is in multiples of the mesh size so every shard stays equal.

    allow_reload: expose POST /v1/reload {"target": <run dir under
    reload_root>, "int8": bool?} — background-compile the new run's
    const-bound executables, then atomically swap (see Reloader); the
    old weights serve throughout, vs a restart's full-warmup downtime.
    """
    import os

    from protoasnet_tpu.parallel import make_mesh
    from protoasnet_tpu.serve import load_trained_agent, make_sharded_serving_fn

    agent, input_shape = load_trained_agent(run_dir)
    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    max_batch = max(n_dev, (max_batch // n_dev) * n_dev)
    buckets = tuple(n_dev * b for b in _bucket_ladder(max_batch // n_dev))

    def build_sharded(agent, want_int8: bool):
        """(jitted sharded fn, sample_shape, dtype) for one checkpoint —
        the initial path and every hot reload go through the same code."""
        qstate = None
        if want_int8:
            from protoasnet_tpu.quant import calibrate_qstate_from_agent

            qstate = calibrate_qstate_from_agent(agent, calib_batches)
        base = {"params": agent.params, "batch_stats": agent.batch_stats}
        variables = ({"variables": base, "qstate": qstate}
                     if qstate is not None else base)
        # weights bound as compile-time constants: +30% serving throughput
        # measured on chip (serve.make_sharded_serving_fn docstring)
        sharded = make_sharded_serving_fn(agent.model, mesh, qstate=qstate,
                                          uint8_gray=uint8_input,
                                          variables=variables)
        sample_shape = input_shape[:-1] if uint8_input else input_shape
        return sharded, sample_shape, np.uint8 if uint8_input else np.float32

    sharded, sample_shape, dtype = build_sharded(agent, int8)

    def fn(x):
        return np.asarray(sharded(x), np.float32)

    reload_build = None
    if allow_reload:
        def reload_build(target, want_int8):
            new_agent, new_shape = load_trained_agent(target)
            if tuple(new_shape) != tuple(input_shape):
                raise ValueError(f"run {target!r} input {new_shape} != "
                                 f"serving contract {tuple(input_shape)}")
            return build_sharded(new_agent, want_int8)

    _serve_loop(fn, sample_shape, dtype, host, port, max_batch,
                max_delay_ms, warmup, ready_event, buckets=buckets,
                banner=f"{run_dir} live on {n_dev} device(s)",
                stop_event=stop_event, reload_build=reload_build,
                reload_root=reload_root or os.path.dirname(
                    os.path.abspath(run_dir)),
                reload_int8=int8)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(prog="python -m protoasnet_tpu.server")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--bundle", help="exported bundle (single device)")
    src.add_argument("--run_dir",
                     help="trained run dir: serve live, data-parallel "
                          "over all local devices")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8300)
    ap.add_argument("--max_batch", type=int, default=128,
                    help="serving sweet spot: 128 per chip on v5e "
                         "(BASELINE.md); scale by device count for "
                         "--run_dir mode")
    ap.add_argument("--max_delay_ms", type=float, default=5.0)
    ap.add_argument("--no_warmup", action="store_true")
    ap.add_argument("--uint8_input", action="store_true",
                    help="(--run_dir only) raw grayscale uint8 frames in, "
                         "eval transform on device")
    ap.add_argument("--int8", action="store_true",
                    help="(--run_dir only) w8a8 backbone")
    ap.add_argument("--calib_batches", type=int, default=4)
    ap.add_argument("--allow_reload", action="store_true",
                    help="expose POST /v1/reload weight hot-swap; targets "
                         "must resolve under --reload_root")
    ap.add_argument("--reload_root", default=None,
                    help="directory reload targets must live under "
                         "(default: the initial artifact's parent dir)")
    a = ap.parse_args(argv)

    # Persistent XLA cache: daemon restarts skip the minutes-long warmup
    # recompiles (measured 2.6-17x faster cold start; utils/run.py).
    from protoasnet_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()

    # Supervisors (systemd, k8s, docker stop) send SIGTERM, not SIGINT;
    # route it through stop_event so in-flight batches drain cleanly.
    # During startup (model load / int8 calibration / warmup compiles —
    # minutes through a relay) there is nothing to drain: exit
    # immediately, or a supervisor's stop-timeout escalates to SIGKILL
    # while we stubbornly finish compiling a server nobody wants.
    import signal

    stop, ready = threading.Event(), threading.Event()

    def _on_term(*_):
        stop.set()
        if not ready.is_set():
            raise SystemExit(143)  # 128 + SIGTERM, the conventional code

    signal.signal(signal.SIGTERM, _on_term)

    if a.bundle:
        serve_forever(a.bundle, a.host, a.port, a.max_batch, a.max_delay_ms,
                      warmup=not a.no_warmup, ready_event=ready,
                      stop_event=stop, allow_reload=a.allow_reload,
                      reload_root=a.reload_root)
    else:
        serve_live(a.run_dir, a.host, a.port, a.max_batch, a.max_delay_ms,
                   warmup=not a.no_warmup, uint8_input=a.uint8_input,
                   int8=a.int8, calib_batches=a.calib_batches,
                   ready_event=ready, stop_event=stop,
                   allow_reload=a.allow_reload, reload_root=a.reload_root)


if __name__ == "__main__":
    main()
