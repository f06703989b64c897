"""HTTP inference server over an exported StableHLO artifact.

The reference has no serving story at all (its eval scripts rebuild the
torch model per run, reference segmentation/eval_valid.py:64-101); this
completes the deployment path that ``deploy/export.py`` starts: a
process that loads ONE self-contained artifact (weights baked in, no
model code or checkpoint directory) and serves it over HTTP.

TPU-shaped serving, not a naive per-request loop:

* **Micro-batching.** The artifact is compiled for a fixed batch B
  (static shapes — there is exactly one program, no recompiles).
  Requests are queued and coalesced into that batch within a
  ``window_ms`` deadline; the tail is padded and the pad rows never
  leave the server.  On this hardware batch-16 full-res inference is
  ~1.5× the throughput of batch-1 (PERF.md), and coalescing also
  amortizes the fixed per-call dispatch latency.
* **Pipelined dispatch.** The device call for batch n+1 is enqueued
  before batch n's outputs are fetched to the host (the same
  enqueue-then-drain structure as bench.py), so host fetch latency
  overlaps device compute.
* **Zero deserialization cost per request.**  Payloads are raw ``.npy``
  bytes (``allow_pickle`` stays off), responses are ``.npz`` of the
  requested output arrays.

Endpoints:

* ``GET /healthz`` — liveness + serving counters (requests, batches,
  mean batch fill).
* ``GET /metrics`` — the same counters in Prometheus text exposition
  format (scrapeable; no client library needed).
* ``GET /manifest`` — the artifact manifest (input shape/dtype, output
  names, class names, prototype→class identity).
* ``POST /predict[?outputs=pred,nearest_proto]`` — body: one ``.npy``
  array, either a single item ``input_shape[1:]`` or a batch
  ``(N, *input_shape[1:])`` with ``N ≤ B``; response: ``.npz`` with the
  selected outputs sliced to N.

CLI: ``python -m adlm_tpu.cli serve <artifact_dir> [--port ...]``.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


class _Pending:
    """One queued request: ``n`` rows starting at ``offset`` of some
    batch; ``event`` fires when ``result`` holds the sliced outputs."""

    __slots__ = ("array", "n", "event", "result", "error")

    def __init__(self, array: np.ndarray):
        self.array = array
        self.n = array.shape[0]
        self.event = threading.Event()
        self.result: Optional[Dict[str, np.ndarray]] = None
        self.error: Optional[BaseException] = None


class MicroBatcher:
    """Coalesces single/partial-batch requests into the artifact's
    fixed batch and runs them through ``call`` on a worker thread.

    ``submit`` blocks the calling (request-handler) thread until its
    rows come back; the worker collects requests for at most
    ``window_ms`` after the first arrival (or until the batch is full),
    pads the tail with zeros, and dispatches.  Dispatch is pipelined:
    while batch n's outputs are being fetched to the host, batch n+1
    may already be enqueued on device.
    """

    def __init__(self, call, batch: int, item_shape: Tuple[int, ...],
                 dtype: Any, window_ms: float = 5.0,
                 outputs: Optional[Sequence[str]] = None):
        self._call = call
        self.batch = int(batch)
        self.item_shape = tuple(item_shape)
        self.dtype = np.dtype(dtype)
        self.window_s = float(window_ms) / 1000.0
        self.outputs = list(outputs) if outputs is not None else None
        self._queue: List[_Pending] = []
        self._lock = threading.Condition()
        self._closed = False
        # serving counters (exposed via /healthz)
        self.n_requests = 0
        self.n_items = 0
        self.n_batches = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, array: np.ndarray,
               timeout: Optional[float] = 60.0) -> Dict[str, np.ndarray]:
        if array.shape[1:] != self.item_shape:
            raise ValueError(
                f"item shape {array.shape[1:]} != artifact item shape "
                f"{self.item_shape}")
        if array.shape[0] > self.batch:
            raise ValueError(
                f"request rows {array.shape[0]} > artifact batch "
                f"{self.batch}; split the request")
        if array.dtype != self.dtype:
            raise ValueError(
                f"dtype {array.dtype} != artifact dtype {self.dtype}")
        p = _Pending(np.ascontiguousarray(array))
        with self._lock:
            if self._closed:
                raise RuntimeError("server is shutting down")
            self._queue.append(p)
            self.n_requests += 1
            self.n_items += p.n
            self._lock.notify()
        if not p.event.wait(timeout):
            raise TimeoutError("inference timed out")
        if p.error is not None:
            raise p.error
        assert p.result is not None
        return p.result

    def close(self):
        with self._lock:
            self._closed = True
            self._lock.notify()
        self._worker.join(timeout=5)

    # -- worker -----------------------------------------------------

    def _take_batch(self) -> List[_Pending]:
        """Wait for work, then collect up to ``batch`` rows within the
        coalescing window."""
        with self._lock:
            while not self._queue and not self._closed:
                self._lock.wait()
            if self._closed and not self._queue:
                return []
            taken: List[_Pending] = []
            rows = 0
            deadline = time.monotonic() + self.window_s
            while True:
                while self._queue and rows + self._queue[0].n <= self.batch:
                    p = self._queue.pop(0)
                    taken.append(p)
                    rows += p.n
                if rows >= self.batch or self._closed:
                    break
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._lock.wait(timeout=remaining)
            return taken

    def _run(self):
        import jax.numpy as jnp

        inflight: Optional[Tuple[List[_Pending], Dict[str, Any]]] = None
        while True:
            taken = self._take_batch()
            if not taken:
                if inflight is not None:
                    self._finish(*inflight)
                return  # closed and drained
            # enqueue this batch BEFORE fetching the previous one:
            # device compute overlaps the host fetch (pipelining)
            enqueued = None
            x = np.zeros((self.batch,) + self.item_shape, self.dtype)
            rows = 0
            for p in taken:
                x[rows:rows + p.n] = p.array
                rows += p.n
            try:
                enqueued = (taken, self._call(jnp.asarray(x)))
                self.n_batches += 1
            except BaseException as e:  # noqa: BLE001
                for p in taken:
                    p.error = e
                    p.event.set()
            if inflight is not None:
                self._finish(*inflight)
                inflight = None
            if enqueued is None:
                continue
            # hold the new batch in flight ONLY if more work is already
            # queued (its fetch then overlaps the next dispatch);
            # otherwise fetch now so a lone request never waits for a
            # successor to arrive
            with self._lock:
                more = bool(self._queue)
            if more:
                inflight = enqueued
            else:
                self._finish(*enqueued)

    def _finish(self, taken: List[_Pending], out: Dict[str, Any]):
        try:
            names = self.outputs or list(out.keys())
            host = {k: np.asarray(out[k]) for k in names}
        except BaseException as e:  # noqa: BLE001
            for p in taken:
                p.error = e
                p.event.set()
            return
        rows = 0
        for p in taken:
            p.result = {k: v[rows:rows + p.n] for k, v in host.items()}
            rows += p.n
            p.event.set()


class InferenceServer:
    """ThreadingHTTPServer around a loaded artifact + MicroBatcher."""

    def __init__(self, artifact_dir: str, port: int = 0,
                 host: str = "127.0.0.1", platform: Optional[str] = None,
                 window_ms: float = 5.0):
        from adlm_tpu.deploy.export import load_inference_artifact

        call, manifest = load_inference_artifact(artifact_dir, platform)
        self.manifest = manifest
        shape = manifest["input"]["shape"]
        self.batcher = MicroBatcher(
            call, batch=shape[0], item_shape=tuple(shape[1:]),
            dtype=manifest["input"]["dtype"], window_ms=window_ms)
        self.known_outputs = list(manifest["outputs"])
        self._httpd = ThreadingHTTPServer((host, port),
                                          self._make_handler())
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def serve_forever(self):
        self._httpd.serve_forever()

    def start(self):
        """Background start (tests / embedding)."""
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        self.batcher.close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, body: bytes,
                      ctype: str = "application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _send_json(self, code: int, obj):
                self._send(code, json.dumps(obj).encode())

            def do_GET(self):
                b = server.batcher
                if self.path.startswith("/healthz"):
                    fill = (b.n_items / (b.n_batches * b.batch)
                            if b.n_batches else None)
                    self._send_json(200, {
                        "status": "ok",
                        "batch": b.batch,
                        "requests": b.n_requests,
                        "batches": b.n_batches,
                        "mean_batch_fill": fill})
                elif self.path.startswith("/metrics"):
                    fill = (b.n_items / (b.n_batches * b.batch)
                            if b.n_batches else 0.0)
                    body = (
                        "# TYPE adlm_requests_total counter\n"
                        f"adlm_requests_total {b.n_requests}\n"
                        "# TYPE adlm_items_total counter\n"
                        f"adlm_items_total {b.n_items}\n"
                        "# TYPE adlm_batches_total counter\n"
                        f"adlm_batches_total {b.n_batches}\n"
                        "# TYPE adlm_batch_size gauge\n"
                        f"adlm_batch_size {b.batch}\n"
                        "# TYPE adlm_mean_batch_fill gauge\n"
                        f"adlm_mean_batch_fill {fill:.6f}\n")
                    self._send(200, body.encode(),
                               ctype="text/plain; version=0.0.4")
                elif self.path.startswith("/manifest"):
                    self._send_json(200, server.manifest)
                else:
                    self._send_json(404, {"error": "unknown path"})

            def do_POST(self):
                if not self.path.startswith("/predict"):
                    self._send_json(404, {"error": "unknown path"})
                    return
                outputs = None
                if "?" in self.path:
                    from urllib.parse import parse_qs, urlparse
                    q = parse_qs(urlparse(self.path).query)
                    if "outputs" in q:
                        outputs = q["outputs"][0].split(",")
                        bad = set(outputs) - set(server.known_outputs)
                        if bad:
                            self._send_json(400, {
                                "error": f"unknown outputs {sorted(bad)}",
                                "available": server.known_outputs})
                            return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    arr = np.load(io.BytesIO(self.rfile.read(n)),
                                  allow_pickle=False)
                except Exception as e:  # noqa: BLE001
                    self._send_json(400, {"error": f"bad .npy body: {e}"})
                    return
                b = server.batcher
                if arr.shape == b.item_shape:     # single item
                    arr, single = arr[None], True
                else:
                    single = False
                try:
                    res = b.submit(arr)
                except (ValueError, TimeoutError) as e:
                    self._send_json(400, {"error": str(e)})
                    return
                except RuntimeError as e:
                    self._send_json(503, {"error": str(e)})
                    return
                if outputs is not None:
                    res = {k: res[k] for k in outputs}
                if single:
                    res = {k: v[0] for k, v in res.items()}
                buf = io.BytesIO()
                np.savez(buf, **res)
                self._send(200, buf.getvalue(),
                           ctype="application/x-npz")

        return Handler
