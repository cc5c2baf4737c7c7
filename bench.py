#!/usr/bin/env python
"""Headline benchmark: 800-frame 180x320 -> 720p streaming video upscale.

Reproduces the reference's benchmark protocol — FPS averaged over 800 frames
with the pretrained 8-block/64-filter generator (reference README.md:10-18;
the reference measured 27 FPS at this shape on an Apple M1 Pro GPU, and the
BASELINE.md target is >=30 FPS sustained per TPU chip).

Protocol: 800 frames as uint8 batches resident on device (pre-staged, as a
double-buffered PCIe feed would provide), each batch through one jitted
program — uint8 -> [-1,1] float, generator forward in bf16, [-1,1] -> uint8 —
timed over the full stream after a warmup batch (compile excluded, matching
the reference's 800-frame averaging). Batches are dispatched with a bounded
in-flight window and the clock stops when the last output is materialized
on device.

Notes on measurement through the development tunnel this environment uses to
reach its TPU: (a) device->host bandwidth is ~1 MB/s (measured), three
orders of magnitude below any real deployment's PCIe link — including bulk
output fetch would benchmark the tunnel, so each batch instead materializes
an int32 checksum of the full uint8 output, forcing complete device
execution with a 4-byte fetch; (b) `block_until_ready` through the tunnel
returns before device completion (measured: it reported a physically
impossible 988 TFLOPs effective), so the checksum fetch is also the
completion barrier. Production-path transfer overlap exists in
SRInferenceEngine.stream (uint8 both ways, bounded in-flight window).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "fps", "vs_baseline": N}
vs_baseline is relative to the reference's published 27 FPS.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_FPS = 27.0  # reference README.md:16-18 (180x320 -> 720p, M1 Pro)


def run(
    batch_size: int, frames: int, h: int, w: int,
    int8_mode: str | None = None,
) -> float:
    """One timed pass at a given batch size/shape; returns sustained FPS.

    int8_mode: run the int8 PTQ tier (fast_srgan_tpu/quant.py —
    docs/DESIGN.md "int8 decision record"). "ups" is the production
    policy (upsampling stages int8, trunk+head float: 579.8 fps @112 vs
    bf16's 463.7 @96 at this shape, 41.91 dB vs fp32); "tail" also
    quantizes the head (477.2 fps @88 — its int32 head output caps the
    batch; 40.60 dB) and is kept as the measured baseline.
    """
    # Round the request up to whole batches — fps counts frames actually
    # processed, so frames and the numerator must agree.
    frames = ((frames + batch_size - 1) // batch_size) * batch_size

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry  # flagship model + pretrained params
    from fast_srgan_tpu.models import Generator
    from fast_srgan_tpu.utils import jax_cache

    jax_cache.enable()

    _, (params, _) = entry()
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    model = Generator(
        n_filters=64, n_layers=8, dtype=jnp.bfloat16, use_pallas=use_pallas
    )
    if int8_mode:
        import functools

        from fast_srgan_tpu import quant

        scales = quant.calibrate_scales(
            params, [quant.default_calibration_batch(h=96, w=160)],
            scale_factor=4,
        )
        only = {
            "ups": quant.is_ups_module,
            "tail": quant.is_tail_module,
        }[int8_mode]
        qtree = quant.quantize_generator_params(params, only=only)
        params = {"q": qtree, "s": scales}

        def apply_fn(p, x):
            return quant.sr_quant_forward(
                p["q"], p["s"], x, scale_factor=4, glue_dtype=jnp.bfloat16
            )

    # LR-domain tail (ops/lr_tail.py): exact phase-decomposition transform,
    # measured 1.27x end-to-end on v5e (scripts/lr_tail_experiment.py).
    # (The int8 tier above IS the LR-domain tail with int8 kernels.)
    elif os.environ.get("BENCH_LR_TAIL", "1") == "1" and not use_pallas:
        from fast_srgan_tpu.ops.lr_tail import generator_apply_lr_tail
        import functools

        apply_fn = functools.partial(generator_apply_lr_tail, model)
    else:
        apply_fn = model.apply

    from fast_srgan_tpu.inference import sr_forward_u8

    # Measured-tuned PJRT compiler options (scripts/xla_flag_sweep.py found
    # scoped-VMEM 48 MiB worth +7.4% on v5e; table in docs/DESIGN.md).
    # FASTSR_COMPILER_OPTIONS overrides (JSON object, or null to disable).
    import functools as _ft

    from fast_srgan_tpu.utils.xla_opts import tuned_compiler_options

    copts = tuned_compiler_options()

    @_ft.partial(jax.jit, compiler_options=copts)
    def forward_u8(p, x_u8):
        u8 = sr_forward_u8(apply_fn, p, x_u8)
        # int32 checksum: a 4-byte completion token per batch (see module
        # docstring — bulk fetch would measure the dev tunnel, and
        # block_until_ready does not actually block through it).
        return u8, jnp.sum(u8, dtype=jnp.int32)

    params = jax.device_put(params)

    # Pre-stage distinct device-resident uint8 batches (round-robin feed).
    rng = np.random.default_rng(0)
    n_batches = (frames + batch_size - 1) // batch_size
    n_staged = min(n_batches, 8)
    staged = [
        jax.device_put(
            rng.integers(0, 256, size=(batch_size, h, w, 3), dtype=np.uint8)
        )
        for _ in range(n_staged)
    ]

    # Warmup: compile + one full execution (checksum fetch = barrier).
    _, ck = forward_u8(params, staged[0])
    int(ck)

    start = time.perf_counter()
    checksums = []
    for i in range(n_batches):
        _, ck = forward_u8(params, staged[i % n_staged])
        checksums.append(ck)
        if len(checksums) > 8:  # bounded in-flight window
            int(checksums.pop(0))
    for ck in checksums:
        int(ck)
    elapsed = time.perf_counter() - start

    return (n_batches * batch_size) / elapsed


def _require_backend(timeout_s: float = 300.0) -> None:
    """Fail fast (not hang) when the accelerator backend cannot initialize.

    Backend init through this environment's TPU tunnel can block
    indefinitely during infrastructure outages (observed: `jax.devices()`
    hanging >10 min with 'TPU backend setup/compile error (Unavailable)').
    Normal init takes seconds — compile time is NOT part of this probe —
    so a generous bound converts an infinite hang into a clear error.

    The probe retries across a bounded window (BENCH_PROBE_RETRIES,
    default 3 attempts with 60 s pauses — ~18 min worst case): the bench
    runs unattended exactly once at round end, and a transient tunnel blip
    at that moment should not forfeit the measurement. Only
    transient-looking failures are retried (init timeout, or an error
    naming Unavailable/deadline); a deterministic init error — wrong
    platform string, missing plugin — fails immediately. Progress goes to
    stderr: stdout carries exactly the one JSON result line."""
    import sys
    import time as _time

    from fast_srgan_tpu.utils.backend_probe import probe_device_count

    attempts = max(1, int(os.environ.get("BENCH_PROBE_RETRIES", "3")))
    err = None
    for i in range(attempts):
        if i:
            _time.sleep(60.0)
            print(
                f"# backend probe retry {i + 1}/{attempts}",
                file=sys.stderr, flush=True,
            )
        n, err = probe_device_count(timeout_s)
        if err is None and n is not None:
            return
        transient = err is None or any(
            s in err.lower() for s in ("unavailable", "deadline", "timed out")
        )
        if not transient:
            raise SystemExit(
                f"accelerator backend init failed (attempt {i + 1}, "
                f"not retrying a deterministic error): {err}"
            )
    if err is not None:
        raise SystemExit(
            f"accelerator backend init failed after {attempts} attempts: {err}"
        )
    raise SystemExit(
        f"accelerator backend failed to initialize within {timeout_s:.0f}s "
        f"x{attempts} attempts (tunnel outage?); aborting the benchmark "
        "instead of hanging"
    )


def main() -> None:
    from fast_srgan_tpu.utils.platforms import honor_env_platforms

    honor_env_platforms()  # JAX_PLATFORMS env beats sitecustomize
    _require_backend()
    frames = int(os.environ.get("BENCH_FRAMES", "800"))
    # Parsed ONCE here (run() takes h, w): the metric label below and the
    # measured program must never diverge. Default is the reference's 720p
    # protocol shape; BENCH_SHAPE=HxW selects its other benchmark shapes.
    shape = os.environ.get("BENCH_SHAPE", "180x320")
    h, w = map(int, shape.split("x"))
    # Batch 128 is the measured bf16 optimum on v5e with the phase-summed
    # LR-tail head (531.9 fps @128 vs 499.5 @112, 481.5 @104; the old
    # concat head capped at ~104 and ran 465 @96 — history in
    # docs/DESIGN.md). The fallback chain guards against a device with
    # less free memory than measured.
    requested = int(os.environ.get("BENCH_BATCH", "128"))
    candidates = list(
        dict.fromkeys(b for b in (requested, 96, 64, 16) if b <= requested)
    )

    def measure(int8_mode, cands) -> tuple:
        for batch_size in cands:
            try:
                return run(batch_size, frames, h, w, int8_mode), batch_size
            except Exception as e:
                # Only retry smaller on memory exhaustion; anything else
                # (bad checkpoint, compile error) would fail at every size
                # too, and retrying masks the real cause.
                msg = str(e).lower()
                oom = "resource_exhausted" in msg or "out of memory" in msg
                if not oom or batch_size == cands[-1]:
                    raise
        raise RuntimeError("unreachable")

    fps, batch = measure(None, candidates)
    arms = {f"bf16_b{batch}": round(fps, 2)}
    mode = "bf16"
    # int8 arm (docs/DESIGN.md "int8 decision record"): the production
    # quantized tier, ups-only (upsampling stages int8, trunk+head float)
    # with the phase-summed head (quant._tail_4x — the 16F concat that was
    # the HBM watermark is never materialized). Measured optimum at
    # 180x320: batch 128, 657.6 fps (132+ compiles to a collapsed ~346 ms
    # schedule; concat-form history: 112 @ 579.8). The optimum tracks
    # LR pixels per program, not batch count — at 90x160 the same
    # 128*180*320-px budget means batch 512, measured 2457 fps vs 2182 at
    # 384 — so the arm tries the pixel-cap batch itself first (at the
    # default 720p shape that IS 128), then the bf16 candidate chain as
    # OOM fallbacks. The headline takes whichever arm measures faster;
    # BENCH_INT8=0 skips the arm; BENCH_INT8_BATCH overrides the first
    # candidate.
    int8_ran = False
    if os.environ.get("BENCH_INT8", "1") == "1":
        i8_pixel_cap = 128 * 180 * 320
        cap = max(1, i8_pixel_cap // (h * w))
        i8_opt = int(os.environ.get("BENCH_INT8_BATCH", str(cap)))
        i8_cands = list(
            dict.fromkeys(
                min(b, cap) for b in (i8_opt, *candidates)
            )
        )
        try:
            fps8, batch8 = measure("ups", i8_cands)
            arms[f"int8ups_b{batch8}"] = round(fps8, 2)
            int8_ran = True
            if fps8 > fps:
                fps, mode = fps8, "int8_ups"
        except Exception as e:
            # the int8 arm must never forfeit the bf16 measurement
            print(f"# int8 arm failed: {e}", file=__import__("sys").stderr)

    label = {"180x320": "720p", "90x160": "360p", "540x960": "4k"}.get(
        shape, "x4"
    )
    # Per-shape reference numbers (reference README.md:10-18; 4K has none —
    # vs_baseline is null there rather than a misleading cross-shape ratio).
    ref_fps = {"180x320": REFERENCE_FPS, "90x160": 82.0}.get(shape)
    result = {
        "metric": f"fps_{shape}_to_{label}_{frames}frames",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / ref_fps, 2) if ref_fps else None,
        "mode": mode,
        "arms": arms,
    }
    if int8_ran:
        # Documented quality bound of the int8 (ups-only) arm vs fp32 on
        # the pretrained 4x checkpoint (uint8 output domain; measured by
        # scripts/eval_int8.py psnr_by_arm, pinned by
        # tests/test_quant.py::TestPretrainedBound — a decision-record
        # constant, not a per-run measurement). Emitted only when the
        # int8 arm actually ran.
        result["int8_ups_psnr_vs_fp32_db_bound"] = 41.91
    print(json.dumps(result))


if __name__ == "__main__":
    main()
