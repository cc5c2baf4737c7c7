#!/usr/bin/env python
"""Batched HTTP super-resolution server.

    python serve.py [--port 8000] [--checkpoint X.(pt|npz)] [--bucket 32]
                    [--max_batch 8] [--max_wait_ms 5] [--fp32]
                    [--int8 [--calib_dir DIR]] [--warm H1xW1,...|none]

    curl -s --data-binary @input.png http://127.0.0.1:8000/upscale > out.png
    curl -s http://127.0.0.1:8000/healthz

Concurrent requests are micro-batched onto the device (TPU throughput comes
from batching); shape bucketing is ON by default so arbitrary client sizes
share compiled programs and batches — exactly (masked forward). The
reference has no serving surface (its inference.py is a one-shot CLI).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fast_srgan_tpu.utils import jax_cache  # noqa: E402

jax_cache.enable()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# Default pre-warm ladder: the common streaming input sizes (90p/180p/270p/
# 360p/540p at 16:9). Each bucket shape compiles once at startup so default
# launches never eat a cold 20-240s compile mid-request (the engine pads
# any in-bucket request into these programs exactly, via the masked
# forward).
_DEFAULT_WARM = "90x160,180x320,270x480,360x640,540x960"


def main() -> None:
    from fast_srgan_tpu.config import load_config
    from fast_srgan_tpu.inference import SRInferenceEngine
    from fast_srgan_tpu.serving import make_server
    from infer import load_generator_params, resolve_default_checkpoint

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", default=8000, type=int)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument(
        "--bucket", default=32, type=int,
        help="shape-bucket granularity (exact; 0 disables = one compile "
        "per distinct request size)",
    )
    parser.add_argument("--max_batch", default=8, type=int)
    parser.add_argument(
        "--max_wait_ms", default=5.0, type=float,
        help="how long a request waits for batch-mates before dispatch",
    )
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument(
        "--int8", action="store_true",
        help="int8 PTQ serving (fast_srgan_tpu/quant.py, ups-only — the "
        "measured-optimal policy). Buckets exactly like bf16 serving: the "
        "masked int8 path runs the canonical masked float trunk + int8 "
        "upsampling stages with pad re-zeroing. Activation scales calibrate on "
        "--calib_dir images when given, else a synthetic batch.",
    )
    parser.add_argument(
        "--calib_dir", default=None,
        help="directory of sample images to calibrate int8 activation "
        "scales on (--int8 only; default: synthetic calibration batch)",
    )
    parser.add_argument(
        "--warm", default=None,
        help="comma-separated HxW LR shapes to precompile before accepting "
        "traffic, e.g. 90x160,180x320 (one program per bucket shape, at "
        "the engine's effective batch — exactly what serving traffic "
        "hits), or 'none' to skip warming. Default: a ladder of common "
        f"video sizes ({_DEFAULT_WARM}) — a fresh TPU compile mid-request "
        "costs 20-240s, so default startup trades a few minutes of "
        "warming for zero cold-compile requests at those sizes.",
    )
    args = parser.parse_args()

    ckpt = args.checkpoint
    if ckpt is None:
        ckpt = resolve_default_checkpoint()

    config = load_config(  # kernel options only; arch comes from the ckpt
        args.config, required=args.config != parser.get_default("config")
    )
    from fast_srgan_tpu.inference import arch_from_params

    params = load_generator_params(ckpt)
    arch = arch_from_params(params)  # checkpoint determines architecture

    bucket = args.bucket
    calib = None
    if args.int8:
        if args.calib_dir:
            from fast_srgan_tpu.quant import calibration_batch_from_images
            from fast_srgan_tpu.utils.images import (
                list_image_files, load_image_u8,
            )

            cb = calibration_batch_from_images(
                load_image_u8(os.path.join(args.calib_dir, n))
                for n in list_image_files(args.calib_dir)
            )
            if cb is None:
                raise SystemExit(
                    f"--calib_dir {args.calib_dir}: no usable image >=32x32"
                )
            calib = [cb]

    engine = SRInferenceEngine(
        params,
        n_filters=arch["n_filters"],
        n_layers=arch["n_layers"],
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
        bucket=bucket,
        use_pallas=config.kernels.use_pallas,
        scale_factor=arch["scale_factor"],
        quantize=args.int8,
        calib_batches=calib,
    )
    # Warm compiled programs before accepting traffic (first TPU compile
    # is 20-240s; a cold-start request would eat it). Warming goes through
    # upscale_images(pad_singletons=True) — exactly the call the batcher
    # makes — so each listed shape compiles the one program traffic will
    # actually hit for its bucket. Default: the _DEFAULT_WARM ladder.
    if args.warm and args.warm.lower() == "none":
        shapes = []
    else:
        shapes = []
        for spec in (args.warm or _DEFAULT_WARM).split(","):
            h, w = (int(v) for v in spec.lower().split("x"))
            shapes.append((h, w))
    for h, w in shapes:
        print(f"warming {h}x{w} ...", flush=True)
        engine.upscale_images(
            [np.zeros((h, w, 3), np.uint8)],
            batch_size=args.max_batch, pad_singletons=True,
        )

    server = make_server(
        engine, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
    )
    print(f"serving on http://{args.host}:{args.port}  "
          f"(bucket={bucket}, max_batch={args.max_batch}"
          f"{', int8' if args.int8 else ''})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        server.batcher.close()


if __name__ == "__main__":
    main()
