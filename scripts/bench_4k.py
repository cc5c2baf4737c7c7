#!/usr/bin/env python
"""4K benchmark: 540x960 -> 2160x3840, latency and streaming throughput.

Measures the production path (bf16 + LR-domain tail) at the two batch
points the engine's policy actually uses for this frame size
(SRInferenceEngine.effective_batch_size):

  * batch 1 — single-frame latency (strict: block on every frame, so the
    dev tunnel's per-dispatch RTT is included; device time is lower);
  * batch 8 — streaming throughput with a bounded in-flight window (the
    checksum completion protocol from bench.py — see its docstring for why
    output fetch is excluded through the dev tunnel).

Batches 2..7 are deliberately absent: measured 200-320 ns/LR-px vs 59 at
batch 8 (the XLA conv lowering wastes MXU sublanes — docs/DESIGN.md
"Batch-size anatomy"), and batch 8 at 720x1280 LR exceeds HBM. v5e
measured (round 4, tuned 48 MiB scoped-VMEM default + phase-summed
LR-tail head; back-to-back repeats agree to <=0.4%): 38.7 ms single-frame
DEVICE latency (the in-jit chain; concat-head history: 42.2), 68.7-69.2
ms strict incl. tunnel RTT, 44.7 ms/frame batch-1 pipelined cadence,
29.8 ms/frame streaming at batch 8 (33.6 fps; the concat head streamed
34.7 — at the memory-capped batch the summed split costs ~3% schedule
efficiency while cutting latency 8%; trade-off recorded in docs/DESIGN.md)
— real-time 4K output per chip, <50 ms single-frame target met on-device.

--int8 (round 4, same protocol): the production ups-only policy measures
35.9 ms device latency (-7% vs bf16), 65-67 ms strict, 42.1 ms cadence,
26.1 ms/frame streaming at batch 8 (38.2 fps, +14%; 41.91 dB vs fp32).
With the phase-summed head ups leads every 4K protocol; the tail-only
baseline (concat head — the summed decomposition needs a float head)
measured 36.4 ms device / 38.0 fps streaming at 40.60 dB — the full
mode-by-shape table is docs/DESIGN.md "int8 decision record".

Usage: python scripts/bench_4k.py [--int8] [BENCH_FRAMES=64]

--int8 measures the production quantized tier instead (ups-only int8,
fast_srgan_tpu/quant.py — docs/DESIGN.md "int8 decision record").
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fast_srgan_tpu.utils import jax_cache  # noqa: E402

jax_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import entry  # noqa: E402
from fast_srgan_tpu.models import Generator  # noqa: E402
from fast_srgan_tpu.ops.lr_tail import generator_apply_lr_tail  # noqa: E402
from fast_srgan_tpu.utils.xla_opts import tuned_compiler_options  # noqa: E402

H = int(os.environ.get("BENCH_H", "540"))  # override for functional smokes
W = int(os.environ.get("BENCH_W", "960"))


def main() -> None:
    frames = int(os.environ.get("BENCH_FRAMES", "64"))
    int8 = "--int8" in sys.argv
    _, (params, _) = entry()
    model = Generator(n_filters=64, n_layers=8, dtype=jnp.bfloat16)

    if int8:
        from fast_srgan_tpu import quant

        scales = quant.calibrate_scales(
            params, [quant.default_calibration_batch(h=96, w=160)],
            scale_factor=4,
        )
        params = {
            "q": quant.quantize_generator_params(
                params, only=quant.is_ups_module
            ),
            "s": scales,
        }

        def apply_fn(p, x):
            return quant.sr_quant_forward(
                p["q"], p["s"], x, scale_factor=4, glue_dtype=jnp.bfloat16
            )

        print("arm: int8 (ups-only PTQ — the production policy)")
    else:
        apply_fn = functools.partial(generator_apply_lr_tail, model)
    params = jax.device_put(params)

    def forward_body(params, x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        sr = apply_fn(params, x)
        out = jnp.clip((sr + 1.0) * 127.5 + 0.5, 0, 255).astype(jnp.uint8)
        return out, jnp.sum(out.astype(jnp.int32))

    # Same tuned PJRT options as the engine/bench (utils/xla_opts.py).
    copts = tuned_compiler_options()
    forward = jax.jit(forward_body, compiler_options=copts)

    rng = np.random.default_rng(0)

    # --- strict single-frame latency (batch 1) ---
    staged = [
        jax.device_put(rng.integers(0, 256, size=(1, H, W, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    _, ck = forward(params, staged[0])
    int(ck)  # compile + completion barrier
    lats = []
    for i in range(min(24, frames)):
        t0 = time.perf_counter()
        _, ck = forward(params, staged[i % 2])
        int(ck)
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))
    print(
        f"single-frame latency (batch 1, incl. host RTT): "
        f"{lat * 1e3:.1f} ms median = {1 / lat:.1f} fps"
    )

    # --- true device latency: in-jit dependent chain (batch 1) ---
    # The strict number above includes this dev environment's ~25-30 ms
    # per-dispatch tunnel RTT (see docs/DESIGN.md "Benchmarking through the
    # development tunnel") — a co-located host does not pay it. The honest
    # device-only single-frame latency is measured the only way sub-dispatch
    # times can be through the tunnel: CHAIN_K sequential batch-1 forwards
    # inside ONE program, each depending on the previous output's checksum
    # (so XLA can neither overlap nor CSE them), statically unrolled (a
    # lax.fori_loop would degrade conv layouts — the measured 33x hazard).
    CHAIN_K = 8

    @functools.partial(jax.jit, compiler_options=copts)
    def chained(params, x_u8):
        total = jnp.int32(0)
        for _ in range(CHAIN_K):
            out, ck = forward_body(params, x_u8)
            total = total + ck
            # data dependency: next input perturbed by this checksum's parity
            x_u8 = x_u8 ^ (ck % 2).astype(jnp.uint8)
        return total

    x1 = jax.device_put(
        rng.integers(0, 256, size=(1, H, W, 3), dtype=np.uint8)
    )
    int(chained(params, x1))  # compile + completion
    chain_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(chained(params, x1))
        chain_times.append(time.perf_counter() - t0)
    dev_lat = min(chain_times) / CHAIN_K
    print(
        f"single-frame device latency (batch 1, {CHAIN_K}-chain in-jit): "
        f"{dev_lat * 1e3:.1f} ms = {1 / dev_lat:.1f} fps"
    )

    # --- batch-1 pipelined cadence (window of 3 in flight) ---
    # What a continuous one-stream pipeline sees per frame: dispatch RTT is
    # hidden by keeping a small window in flight; per-frame completion
    # cadence approaches the device latency.
    staged1 = [
        jax.device_put(rng.integers(0, 256, size=(1, H, W, 3), dtype=np.uint8))
        for _ in range(3)
    ]
    _, ck = forward(params, staged1[0])
    int(ck)
    n1 = min(48, max(frames, 16))
    t0 = time.perf_counter()
    cks = []
    for i in range(n1):
        _, ck = forward(params, staged1[i % 3])
        cks.append(ck)
        if len(cks) > 3:
            int(cks.pop(0))
    for ck in cks:
        int(ck)
    cadence = (time.perf_counter() - t0) / n1
    print(
        f"batch-1 pipelined cadence (window 3): "
        f"{cadence * 1e3:.1f} ms/frame = {1 / cadence:.1f} fps"
    )

    # --- streaming throughput (batch 8, bounded in-flight window) ---
    batch = 8
    n_batches = max(2, frames // batch)
    staged = [
        jax.device_put(
            rng.integers(0, 256, size=(batch, H, W, 3), dtype=np.uint8)
        )
        for _ in range(2)
    ]
    _, ck = forward(params, staged[0])
    int(ck)
    start = time.perf_counter()
    cks = []
    for i in range(n_batches):
        _, ck = forward(params, staged[i % 2])
        cks.append(ck)
        if len(cks) > 4:
            int(cks.pop(0))
    for ck in cks:
        int(ck)
    dt = time.perf_counter() - start
    print(
        f"streaming throughput (batch 8): "
        f"{dt / (n_batches * batch) * 1e3:.1f} ms/frame = "
        f"{n_batches * batch / dt:.1f} fps"
    )


if __name__ == "__main__":
    main()
