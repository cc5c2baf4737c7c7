#!/usr/bin/env python
"""CLI batch image super-resolution (reference-compatible surface).

Usage (same required flags as /root/reference/inference.py:12-14):

    python infer.py --image_dir INPUT_DIR --output_dir OUTPUT_DIR
        [--checkpoint PATH.pt|.npz] [--batch_size N] [--bucket N]
        [--fp32] [--config configs/config.yaml]

Behavior parity: loads the pretrained generator (reference-format .pt
checkpoints accepted directly, `_orig_mod.` prefixes stripped), globs
png/jpg/jpeg case-insensitively, upscales each image 4x at native resolution,
and writes results under the same basename. TPU-native improvements: jitted
batched execution with same-shape grouping, bf16 compute, optional shape
bucketing to bound recompiles.
"""

from __future__ import annotations

import argparse
import os
import time

import jax.numpy as jnp
import numpy as np

from fast_srgan_tpu.checkpoints.torch_compat import load_reference_generator_params
from fast_srgan_tpu.config import load_config
from fast_srgan_tpu.inference import SRInferenceEngine
from fast_srgan_tpu.utils import jax_cache
from fast_srgan_tpu.utils.images import list_image_files, load_image_u8, save_image_u8

jax_cache.enable()

DEFAULT_CHECKPOINTS = (
    "models/generator_pretrained.npz",
    "models/model.pt",
    "/root/reference/models/model.pt",
)


def resolve_default_checkpoint() -> str:
    """First existing entry of DEFAULT_CHECKPOINTS, or SystemExit.

    The one definition of the no-flag checkpoint search policy, shared by
    every CLI that accepts an optional --checkpoint."""
    ckpt = next((c for c in DEFAULT_CHECKPOINTS if os.path.exists(c)), None)
    if ckpt is None:
        raise SystemExit(
            "No checkpoint found; pass --checkpoint (searched: "
            + ", ".join(DEFAULT_CHECKPOINTS) + ")"
        )
    return ckpt


def load_generator_params(path: str):
    """Load generator params from .npz (native) or .pt (reference format)."""
    if not os.path.exists(path):
        raise SystemExit(
            f"checkpoint not found: {path!r} (expected a native .npz or a "
            "reference-format .pt file)"
        )
    if path.endswith(".npz"):
        from fast_srgan_tpu.checkpoints.npz_io import load_npz_params

        return load_npz_params(path)
    return load_reference_generator_params(path)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("Real Time Image Super Resolution (TPU)")
    parser.add_argument("--image_dir", default=None, type=str)
    parser.add_argument("--output_dir", default=None, type=str)
    parser.add_argument(
        "--video", default=None, type=str, nargs="+",
        help="upscale video file(s) instead of an image directory "
        "(streamed: decode, batched device pipeline, and encode overlap; "
        "several files of one frame size share device batches)",
    )
    parser.add_argument(
        "--video_out", default=None, type=str,
        help="output video path (default: <output_dir>/<video basename>)",
    )
    parser.add_argument("--checkpoint", default=None, type=str)
    parser.add_argument("--config", default="configs/config.yaml", type=str)
    # None defaults: resolved from the config's `inference:` section below
    # (a flag given on the command line wins).
    parser.add_argument("--batch_size", default=None, type=int)
    parser.add_argument(
        "--bucket", default=None, type=int,
        help="zero-pad LR inputs to multiples of this to bound recompiles "
        "on mixed-size directories; exact via the masked forward "
        "(0 = one compiled program per distinct shape)",
    )
    parser.add_argument(
        "--fp32", action="store_true", help="fp32 compute (default bf16)"
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="int8 PTQ inference (fast_srgan_tpu/quant.py, ups-only — the "
        "measured-optimal policy): int8 convs on the MXU for the LR-domain "
        "upsampling stages, activation scales calibrated on real inputs — "
        "the first input images, or the first decoded frames of each video "
        "stream (fast_srgan_tpu/video.py). Measured speed/quality "
        "in scripts/eval_int8.py. Composes with --bucket (exact masked "
        "path) and with --tile (width-sharded int8 forward, same values "
        "as single-device int8 up to rare one-quantization-step flips "
        "from fp32 reduction order — parallel/spatial.py).",
    )
    parser.add_argument(
        "--tile", default=None, type=int,
        help="shard each frame's width across N devices (exact halo-exchange"
        " tiling with psum'd instance-norm statistics; width must divide N)",
    )
    args = parser.parse_args(argv)
    if args.video is None and (args.image_dir is None or args.output_dir is None):
        parser.error("--image_dir and --output_dir are required (or use --video)")
    if args.video is not None and args.video_out is None and args.output_dir is None:
        parser.error("--video needs --video_out or --output_dir")

    ckpt = args.checkpoint
    if ckpt is None:
        ckpt = resolve_default_checkpoint()

    config = load_config(
        args.config, required=args.config != parser.get_default("config")
    )
    params = load_generator_params(ckpt)
    # The checkpoint determines the architecture (any n_filters/n_layers/
    # scale trains here); the config is only consulted for kernel options.
    from fast_srgan_tpu.inference import arch_from_params

    arch = arch_from_params(params)
    cfg_arch = {
        "n_filters": config.generator.n_filters,
        "n_layers": config.generator.n_layers,
        "scale_factor": config.data.scale_factor,
    }
    if arch != cfg_arch:
        print(f"checkpoint architecture {arch} (overrides config {cfg_arch})")

    def flag(name):
        v = getattr(args, name)
        return config.inference[name] if v is None else v

    tile, bucket, batch_size = flag("tile"), flag("bucket"), flag("batch_size")
    if tile and bucket:
        parser.error(
            "--tile and --bucket are mutually exclusive: tiling runs whole "
            "frames across devices, bucketing batches padded frames on one"
        )
    # --int8 composes with BOTH scaling modes: --bucket via the exact
    # masked int8 path, --tile via the width-sharded int8 forward
    # (parallel/spatial.py build_tiled_quant_forward; asserted vs the
    # single-device int8 tier in tests/test_spatial_quant.py — same
    # values up to rare one-step quantization flips from fp32 reduction
    # order, see the module's sharded-int8 section comment).
    if args.video is not None:
        # Only reject EXPLICIT flags: a config carrying inference.tile/bucket
        # for directory runs must not break video invocations that never
        # asked for them (video frames are one fixed shape — neither mode
        # applies, so config-sourced values are simply ignored here).
        if args.tile or args.bucket:
            parser.error("--video supports neither --tile nor --bucket")
        tile, bucket = 0, 0

    def make_engine(calib_batches=None):
        # not built on the --tile path (tiling uses the raw params)
        return SRInferenceEngine(
            params,
            n_filters=arch["n_filters"],
            n_layers=arch["n_layers"],
            dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
            bucket=bucket,
            use_pallas=config.kernels.use_pallas,
            scale_factor=arch["scale_factor"],
            quantize=args.int8,
            calib_batches=calib_batches,
        )

    if args.video is not None:
        engine = make_engine()
        if args.output_dir:
            os.makedirs(args.output_dir, exist_ok=True)
        if len(args.video) == 1:
            from fast_srgan_tpu.video import upscale_video

            out_path = args.video_out or os.path.join(
                args.output_dir, os.path.basename(args.video[0])
            )
            stats = upscale_video(
                engine, args.video[0], out_path, batch_size=batch_size
            )
            print(
                f"Done: {stats['frames']} frames in {stats['seconds']:.2f}s "
                f"({stats['frames'] / max(stats['seconds'], 1e-9):.1f} fps) "
                f"-> {out_path}"
            )
            return
        # several streams share one device pipeline (batches interleave)
        if args.video_out is not None:
            parser.error("--video_out is for a single video; "
                         "use --output_dir with several")
        if not args.output_dir:
            parser.error("several --video files need --output_dir")
        from fast_srgan_tpu.video import upscale_videos

        outs = [
            os.path.join(args.output_dir, os.path.basename(v))
            for v in args.video
        ]
        stats = upscale_videos(
            engine, args.video, outs, batch_size=batch_size
        )
        fps = stats["frames"] / max(stats["seconds"], 1e-9)
        print(
            f"Done: {len(args.video)} streams, {stats['frames']} frames "
            f"({stats['per_stream']}) in {stats['seconds']:.2f}s "
            f"({fps:.1f} fps aggregate) -> {args.output_dir}"
        )
        return

    os.makedirs(args.output_dir, exist_ok=True)
    names = list_image_files(args.image_dir)
    paths = [os.path.join(args.image_dir, n) for n in names]
    if not bucket and not tile and len(names) > 1:
        from PIL import Image

        shapes = set()
        for p in paths[:512]:  # advisory only — don't rescan a huge dir
            with Image.open(p) as im:  # header only, no decode
                shapes.add(im.size)
            if len(shapes) > 4:
                print(
                    f"note: >4 distinct image shapes — each compiles its own "
                    f"program (~20-40s on TPU). --bucket 32 pads to a shape "
                    f"grid instead; exact (masked statistics), "
                    f"few-percent compute overhead."
                )
                break
    print(f"Found {len(names)} to super resolve, starting...")
    calib = None
    if args.int8 and paths:
        # Calibrate activation scales on the actual inputs (one compile):
        # center crops of the first few images. Falls back to the synthetic
        # default batch inside the engine if none is usable.
        from fast_srgan_tpu.quant import calibration_batch_from_images

        cb = calibration_batch_from_images(load_image_u8(p) for p in paths)
        if cb is not None:
            calib = [cb]
    t0 = time.perf_counter()
    if tile > 0:
        from fast_srgan_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(tile, axis_name="sp")
        dtype = jnp.float32 if args.fp32 else jnp.bfloat16
        if args.int8:
            # Exact width-sharded int8: the production ups-only PTQ arm
            # under halo-exchange tiling (build_tiled_quant_forward),
            # activation scales calibrated on the actual inputs above.
            from fast_srgan_tpu import quant
            from fast_srgan_tpu.parallel.spatial import tiled_quant_upscale_u8

            qtree = quant.quantize_generator_params(
                params, only=quant.is_ups_module
            )
            scales = quant.calibrate_scales(
                params,
                calib or [quant.default_calibration_batch()],
                arch["scale_factor"],
            )
            for name, path in zip(names, paths):
                out = tiled_quant_upscale_u8(
                    qtree, scales, load_image_u8(path), mesh,
                    glue_dtype=dtype, scale_factor=arch["scale_factor"],
                )
                save_image_u8(os.path.join(args.output_dir, name), out)
        else:
            from fast_srgan_tpu.parallel.spatial import tiled_upscale_u8

            for name, path in zip(names, paths):
                out = tiled_upscale_u8(
                    params, load_image_u8(path), mesh, dtype=dtype
                )
                save_image_u8(os.path.join(args.output_dir, name), out)
    else:
        engine = make_engine(calib_batches=calib)
        # Memory-bounded: images decoded one batch at a time, saved as done.
        for i, out in engine.upscale_files(paths, batch_size=batch_size):
            save_image_u8(os.path.join(args.output_dir, names[i]), out)
    dt = time.perf_counter() - t0
    print(f"Done: {len(names)} images in {dt:.2f}s ({len(names) / dt:.1f} img/s)")


if __name__ == "__main__":
    main()
