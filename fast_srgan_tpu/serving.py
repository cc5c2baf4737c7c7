"""Batched HTTP serving for the SR engine.

The reference has no serving story (its inference.py is a batch CLI —
reference inference.py:47-57); this is the production-serving layer the TPU
rebuild adds: a stdlib HTTP daemon in front of :class:`SRInferenceEngine`
with cross-request micro-batching.

Design:

  * Requests (`POST /upscale`, body = PNG/JPEG bytes) land in a queue; a
    single device thread drains it, coalescing up to ``max_batch`` images
    that arrive within ``max_wait_ms`` into one engine call. TPU throughput
    comes from batching — serving frames one-by-one leaves most of the chip
    idle (bench.py: batch 16 sustains 315 FPS where batch 1 is
    dispatch-bound).
  * The engine runs with shape bucketing by default, so requests of
    *different* sizes share one compiled program AND one device batch —
    exact outputs via the masked forward (inference.py), bounded compile
    count for arbitrary client sizes.
  * Responses are PNG (lossless: JPEG re-encoding would perturb the SR
    output more than the compute noise it sits on).

Endpoints: POST /upscale -> image/png; GET /healthz, GET /stats -> JSON.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np


class _Pending:
    __slots__ = ("image", "done", "result", "error")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.done = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[Exception] = None


class MicroBatcher:
    """Coalesce concurrent requests into device batches.

    One worker thread owns the engine (JAX dispatch is not free-threaded);
    it blocks for the first request, then gives stragglers ``max_wait_ms``
    to join the batch up to ``max_batch``.
    """

    def __init__(
        self,
        engine,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        request_timeout: float = 600.0,
    ):
        # request_timeout must exceed the worst-case first TPU compile of a
        # new bucket shape (~240s through this environment's tunnel) plus
        # queueing; a timeout below that turns valid cold-shape requests
        # into spurious 500s while the device still computes the result.
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.request_timeout = request_timeout
        self.queue: "queue.Queue[_Pending]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "errors": 0}
        self._stop = threading.Event()
        # serializes enqueue vs. shutdown: without it a submit() that
        # passed the _stop check could enqueue AFTER close() drained the
        # queue, leaving its handler blocked for the full request timeout
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(
        self, image: np.ndarray, timeout: Optional[float] = None
    ) -> np.ndarray:
        timeout = self.request_timeout if timeout is None else timeout
        item = _Pending(image)
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("server is shutting down")
            self.queue.put(item)  # unbounded queue: never blocks in-lock
        if not item.done.wait(timeout):
            raise TimeoutError("upscale timed out")
        if item.error is not None:
            raise item.error
        return item.result  # type: ignore[return-value]

    def close(self) -> None:
        with self._submit_lock:
            self._stop.set()
            self.queue.put(None)  # type: ignore[arg-type]
        self._thread.join(timeout=30)
        # Fail any requests still queued behind the sentinel instead of
        # leaving their handler threads blocked until the request timeout
        # (no new items can appear after the locked _stop above).
        while True:
            try:
                item = self.queue.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item.error = RuntimeError("server shut down")
                item.done.set()

    def _worker(self) -> None:
        while not self._stop.is_set():
            first = self.queue.get()
            if first is None:
                return
            batch: List[_Pending] = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self.queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._stop.set()
                    break
                batch.append(nxt)
            try:
                # pad_singletons: the engine zero-pads every chunk — lone
                # images included — to its compiled batch for the shape, so
                # serving traffic only ever compiles ONE program per bucket
                # shape (a 1..max_batch-sized batch would otherwise each be
                # a fresh 20-240s TPU compile mid-traffic). Padding happens
                # per shape group inside the engine, which also drops to
                # batch 1 for frames too large to batch within HBM.
                images = [it.image for it in batch]
                outs = self.engine.upscale_images(
                    images, batch_size=self.max_batch, pad_singletons=True
                )
                if len(outs) != len(images):
                    raise RuntimeError(
                        f"engine returned {len(outs)} outputs for "
                        f"{len(images)} images"
                    )
                for it, out in zip(batch, outs):
                    it.result = out
            except Exception as e:  # surface to every waiter in the batch
                self.stats["errors"] += 1
                for it in batch:
                    it.error = e
            finally:
                self.stats["requests"] += len(batch)
                self.stats["batches"] += 1
                for it in batch:
                    it.done.set()


def make_server(
    engine,
    host: str = "127.0.0.1",
    port: int = 8000,
    max_batch: int = 8,
    max_wait_ms: float = 5.0,
    max_body_bytes: int = 64 * 1024 * 1024,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; `.batcher` is attached for reuse.

    Start with `server.serve_forever()`; stop with `server.shutdown()` and
    `server.batcher.close()`.
    """
    from PIL import Image

    batcher = MicroBatcher(engine, max_batch=max_batch, max_wait_ms=max_wait_ms)
    started = time.time()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; stats live at /stats
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            elif self.path == "/stats":
                self._json(
                    200, dict(batcher.stats, uptime_s=round(time.time() - started, 1))
                )
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/upscale":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length > max_body_bytes:
                    self._json(
                        413, {"error": f"body over {max_body_bytes} bytes"}
                    )
                    return
                raw = self.rfile.read(length)
                img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
            except Exception as e:
                self._json(400, {"error": f"bad image: {e}"})
                return
            try:
                out = batcher.submit(img)
            except Exception as e:
                self._json(500, {"error": str(e)})
                return
            buf = io.BytesIO()
            Image.fromarray(out).save(buf, format="PNG")
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher  # type: ignore[attr-defined]
    return server
