#!/usr/bin/env python
"""Measure the HTTP serving layer end-to-end: concurrent clients, one chip.

The serving stack (serve.py / fast_srgan_tpu/serving.py) so far had
functional tests but no measured number. This benchmark starts the real
server in-process on an ephemeral port, fires CONCURRENCY client threads
each posting REQUESTS PNG-encoded LR frames, and reports:

  * end-to-end request latency (p50/p90/p99) — PNG decode, micro-batch
    wait, device forward, PNG encode, HTTP both ways;
  * sustained requests/s across the load phase;
  * micro-batch fill (requests per device batch) from /stats — the
    mechanism that makes concurrent serving cheap on TPU.

Protocol notes for THIS environment (see docs/DESIGN.md "Benchmarking
through the development tunnel"): the host is a single CPU core — PNG
codec work for all clients shares that core — and every device dispatch
crosses the dev tunnel (~25-30 ms RTT), which a real deployment's local
PCIe link would not pay. The numbers below are therefore a conservative
floor for the serving layer itself; the device-side forward at these
shapes is the minority cost (bench.py measures it in isolation).

Mixed-size load: SHAPE may be a comma-separated list — clients rotate
through the shapes. Every listed shape is pre-warmed exactly the way
serve.py's startup ladder does (engine.upscale_images with
pad_singletons=True), and the report counts **cold compiles during the
load phase directly** from the engine's jit caches (`_cache_size` delta):
`cold_compiles: 0` proves no request paid a 20-240s mid-request compile.

Usage:
  python scripts/bench_serve.py            # TPU (or current backend)
  CONCURRENCY=16 REQUESTS=8 SHAPE=90x160,180x320,270x480 MAX_BATCH=8 \
      python scripts/bench_serve.py
"""

from __future__ import annotations

import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fast_srgan_tpu.utils import jax_cache  # noqa: E402

jax_cache.enable()


def main() -> None:
    from PIL import Image

    import jax.numpy as jnp

    from fast_srgan_tpu.inference import SRInferenceEngine, arch_from_params
    from fast_srgan_tpu.serving import make_server
    from infer import load_generator_params, resolve_default_checkpoint

    concurrency = int(os.environ.get("CONCURRENCY", "16"))
    n_requests = int(os.environ.get("REQUESTS", "8"))  # per client
    shapes = [
        tuple(int(v) for v in s.split("x"))
        for s in os.environ.get("SHAPE", "180x320").split(",")
    ]
    h, w = shapes[0]
    max_batch = int(os.environ.get("MAX_BATCH", "8"))
    max_wait_ms = float(os.environ.get("MAX_WAIT_MS", "5"))

    int8 = os.environ.get("INT8", "0") == "1"  # serve.py --int8 equivalent
    params = load_generator_params(resolve_default_checkpoint())
    arch = arch_from_params(params)
    engine = SRInferenceEngine(
        params,
        n_filters=arch["n_filters"],
        n_layers=arch["n_layers"],
        scale_factor=arch["scale_factor"],
        dtype=jnp.bfloat16,
        bucket=32,
        quantize=int8,
    )
    server = make_server(
        engine, port=0, max_batch=max_batch, max_wait_ms=max_wait_ms
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    # One deterministic LR frame per shape, PNG-encoded once; every request
    # posts those bytes (the server decodes per request — that cost is real).
    rng = np.random.default_rng(0)
    bodies = []
    for sh, sw in shapes:
        frame = rng.integers(0, 256, size=(sh, sw, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="PNG")
        bodies.append(buf.getvalue())
    url = f"http://127.0.0.1:{port}/upscale"

    def post(body: bytes) -> bytes:
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/octet-stream"}
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            return resp.read()

    # Pre-warm every shape the way serve.py's startup ladder does — one
    # compiled program per bucket shape, at the batch the traffic will hit.
    for sh, sw in shapes:
        print(f"# warming {sh}x{sw}", file=sys.stderr, flush=True)
        engine.upscale_images(
            [np.zeros((sh, sw, 3), np.uint8)],
            batch_size=max_batch, pad_singletons=True,
        )
    # Verify one request per shape decodes (these may still share warm
    # programs; compile counting starts AFTER this point).
    for (sh, sw), body in zip(shapes, bodies):
        out = Image.open(io.BytesIO(post(body)))
        assert out.size == (4 * sw, 4 * sh), (out.size, sh, sw)

    def engine_compiled_programs() -> int:
        return (
            engine._forward_u8._cache_size()
            + engine._forward_u8_masked._cache_size()
        )

    compiled_before = engine_compiled_programs()

    lat_lock = threading.Lock()
    latencies: list = []
    errors: list = []

    def client(cid: int) -> None:
        for i in range(n_requests):
            body = bodies[(cid + i) % len(bodies)]  # rotate shapes
            t0 = time.perf_counter()
            try:
                post(body)
            except Exception as e:  # noqa: BLE001 — record, don't crash the load
                with lat_lock:
                    errors.append(repr(e))
                continue
            dt = time.perf_counter() - t0
            with lat_lock:
                latencies.append(dt)

    stats0 = json.loads(
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=60
        ).read()
    )
    threads = [
        threading.Thread(target=client, args=(c,)) for c in range(concurrency)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0
    stats1 = json.loads(
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=60
        ).read()
    )
    server.shutdown()
    server.batcher.close()

    total = len(latencies)
    lat_ms = np.sort(np.asarray(latencies)) * 1e3
    d_req = stats1["requests"] - stats0["requests"]
    d_batches = max(1, stats1["batches"] - stats0["batches"])
    shape_tag = "_".join(f"{sh}x{sw}" for sh, sw in shapes)
    result = {
        "metric": f"serve_rps_{shape_tag}_c{concurrency}",
        "value": round(total / elapsed, 2),
        "unit": "req/s",
        "mode": "int8_ups" if int8 else "bf16",
        # jit cache-size delta across the load phase: 0 proves no request
        # paid a mid-request compile (the warm ladder covered the traffic)
        "cold_compiles": engine_compiled_programs() - compiled_before,
        "p50_ms": round(float(lat_ms[total // 2]), 1),
        "p90_ms": round(float(lat_ms[int(total * 0.9)]), 1),
        "p99_ms": round(float(lat_ms[min(total - 1, int(total * 0.99))]), 1),
        "batch_fill": round(d_req / d_batches, 2),
        "max_batch": max_batch,
        "requests": total,
        "errors": len(errors),
    }
    print(json.dumps(result))
    if errors:
        print(f"# first error: {errors[0]}", file=sys.stderr)


if __name__ == "__main__":
    main()
