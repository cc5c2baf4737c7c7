#!/usr/bin/env python
"""Measure the int8 PTQ tier's fidelity/speed trade on the current device.

    python scripts/eval_int8.py [--checkpoint PATH] [--batch 96]
        [--shape 180x320] [--scale {2,4,8}] [--iters 8]
        [--calib_ab DIR|synthetic] [--psnr_percentiles P,P,...]

Reports, as one JSON object:
  * quality: PSNR(int8, fp32) in the uint8 output domain on synthetic
    natural-statistics frames (quant.default_calibration_batch) with the
    given (default: shipped pretrained) weights — the serving contract
    tests/test_quant.py::TestPretrainedBound bounds;
  * speed: ms/batch and fps for the production bf16 LR-tail forward vs the
    int8 forward at the same shape, with the checksum-barrier protocol
    (bench.py module docstring: through the dev tunnel, block_until_ready
    returns early and bulk fetch measures the tunnel — so each program
    returns an int32 checksum and its 4-byte fetch is the barrier).

Reference behavior being accelerated: the per-frame generator forward,
/root/reference/inference.py:47-57.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fast_srgan_tpu.utils import jax_cache  # noqa: E402

jax_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fast_srgan_tpu import quant  # noqa: E402
from fast_srgan_tpu.models import Generator  # noqa: E402
from fast_srgan_tpu.ops.lr_tail import generator_apply_lr_tail  # noqa: E402
from fast_srgan_tpu.utils.xla_opts import tuned_compiler_options  # noqa: E402


def bench(fn, args_, iters, repeats=3):
    """Best-of sustained ms/iter over a dependent chain, checksum barrier."""
    out, ck = fn(*args_)
    int(ck)  # compile + completion barrier
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out, ck = fn(*args_)
            del out
        int(ck)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument(
        "--batch", default="96",
        help="comma-separated batch sizes to sweep; OOM arms are recorded "
        "and skipped (the int8 program's int32 conv outputs make its HBM "
        "watermark slightly higher than bf16's at equal batch)",
    )
    p.add_argument("--shape", default="180x320")
    p.add_argument(
        "--scale", type=int, default=4, choices=[2, 4, 8],
        help="generator scale factor. 2x/8x have no pretrained artifact "
        "(the reference is fixed 4x — /root/reference/model.py:97-100); "
        "their weights are adapted from the 4x checkpoint (2x: drop the "
        "second upsampling stage; 8x: clone it as a third) — realistic "
        "trained-weight distributions for PTQ fidelity, and the exact "
        "per-stage structure the production 2x/8x generators compile to "
        "for speed",
    )
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--glue", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument(
        "--hybrids", action="store_true",
        help="also measure the trunk-only quantization arm "
        "(diagnoses where the op-level int8 win is lost end-to-end)",
    )
    p.add_argument(
        "--arms", default=None,
        help="comma-separated subset of arms to time "
        "(bf16,int8,int8_tail_only,int8_trunk_only,int8_ups_only,"
        "int8_head_only); default: bf16, int8 "
        "and tail-only (+ trunk-only with --hybrids)",
    )
    p.add_argument(
        "--calib_ab", default=None,
        help="directory of frames, or 'synthetic' (a procedural clip) — "
        "A/B the production ups-only arm's PSNR vs fp32 ON those frames "
        "under (a) the synthetic default calibration batch and (b) "
        "calibration on the frames themselves (the real-input policy). "
        "Measures what --video --int8 gains by calibrating on its first "
        "decoded frames instead of the synthetic batch (quality-only).",
    )
    p.add_argument(
        "--psnr_percentiles", default=None,
        help="comma-separated activation-calibration percentiles (e.g. "
        "'99.5,99.9,99.99') — reports PSNR of the production ups-only arm "
        "under each, vs the max-abs default (quality-only; speed arms "
        "always use max-abs scales)",
    )
    args = p.parse_args()
    h, w = map(int, args.shape.split("x"))

    from infer import load_generator_params, resolve_default_checkpoint

    ckpt = args.checkpoint or resolve_default_checkpoint()
    params = load_generator_params(ckpt)
    sf = args.scale
    bare = dict(params["params"] if "params" in params else params)
    n_up = len([k for k in bare if str(k).startswith("upsampling_")])
    if sf != 2 ** n_up:
        if n_up != 2:
            raise SystemExit(
                f"--scale {sf} asked but the checkpoint is {2 ** n_up}x "
                "and only 4x checkpoints can be stage-adapted (see "
                "--scale help); pass a matching checkpoint"
            )
        # adapt the 4x checkpoint's stages to the requested scale (see
        # --scale help); the upsampling convs are all F->4F so stage
        # weights transplant exactly
        if sf == 2:
            bare.pop("upsampling_1")
        else:
            bare["upsampling_2"] = bare["upsampling_1"]
        params = {"params": bare}

    # --- quality (fp32 vs int8, uint8 output domain) -----------------------
    is_trunk, is_tail = quant.is_trunk_module, quant.is_tail_module

    # 8x: half-size quality frames (the hierarchical tail's 2x-res
    # 1024-ch maps make the 96x160 batch ~10x the 4x cost; PSNR is
    # vs fp32 on the same frames either way)
    xq = (
        quant.default_calibration_batch(h=48, w=80, n=2, seed=7)
        if sf == 8
        else quant.default_calibration_batch(h=96, w=160, n=4, seed=7)
    )
    scales = quant.calibrate_scales(params, [xq], scale_factor=sf)
    qparams = quant.quantize_generator_params(params)
    qtail = quant.quantize_generator_params(params, only=is_tail)
    ref = quant.sr_float_forward(params, xq, scale_factor=sf)
    u8 = lambda y: np.clip((np.asarray(y, np.float32) + 1) * 127.5, 0, 255)

    def psnr_of(tree, s=None):
        out = quant.sr_quant_forward(
            tree, s if s is not None else scales, xq,
            scale_factor=sf, glue_dtype=jnp.float32,
        )
        mse = float(np.mean((u8(ref) - u8(out)) ** 2))
        return 10 * np.log10(255.0**2 / max(mse, 1e-12))

    psnr = psnr_of(qparams)
    psnr_tail = psnr_of(qtail)
    psnr_by_arm = {"int8": psnr, "int8_tail_only": psnr_tail}

    # --- speed: bf16 LR-tail (production) vs int8 ---------------------------
    glue = jnp.bfloat16 if args.glue == "bfloat16" else jnp.float32
    model = Generator(
        n_filters=64, n_layers=8, dtype=jnp.bfloat16, scale_factor=sf
    )
    apply_bf16 = functools.partial(generator_apply_lr_tail, model)
    copts = tuned_compiler_options()

    @functools.partial(jax.jit, compiler_options=copts)
    def fwd_bf16(p, x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        y = apply_bf16(p, x)
        u = ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)
        return u, jnp.sum(u, dtype=jnp.int32)

    @functools.partial(jax.jit, compiler_options=copts)
    def fwd_int8(qp, s, x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        y = quant.sr_quant_forward(qp, s, x, scale_factor=sf, glue_dtype=glue)
        u = ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)
        return u, jnp.sum(u, dtype=jnp.int32)

    # Hybrid arms (per-leaf executor dispatch): quantize only the trunk
    # (neck/stems/bottleneck — the shape the op-level probe measured 1.9x
    # on) or only the LR tail (the wide 256/1024-ch convs). Measured
    # 2026-08-19 (v5e, batch 88): tail-only WINS (477.7 fps vs bf16 424.8),
    # trunk-only loses (366.9), full int8 loses (405.2) — the IN-glued
    # trunk is where int8 dies; the tail is where it pays.

    rng = np.random.default_rng(0)
    params_d = jax.device_put(params)
    scales_d = jax.device_put(scales)

    def arm(fn, args_of_x, b):
        # The input device_put sits INSIDE the try: after a prior arm
        # OOMs, HBM can stay exhausted/fragmented long enough that even
        # a small transfer fails — that must record as an OOM row, not
        # kill the sweep (observed on v5e at a 384x90x160 bf16 arm).
        try:
            x_u8 = jax.device_put(
                rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
            )
            ms = bench(fn, args_of_x(x_u8), args.iters)
        except Exception as e:  # record OOM arms, keep sweeping
            msg = str(e).lower()
            if "resource_exhausted" in msg or "out of memory" in msg:
                import gc

                gc.collect()  # drop dead device buffers before the next arm
                return {"oom": True}
            raise
        return {"ms": round(ms, 2), "fps": round(b / ms * 1e3, 1)}

    if args.arms:
        wanted = set(args.arms.split(","))
    else:
        wanted = {"bf16", "int8", "int8_tail_only"}
        if args.hybrids:
            wanted.add("int8_trunk_only")
    # Hybrid/partial arms (per-leaf executor dispatch). The partial-tail
    # arms probe whether shrinking the int32 live set (the OOM driver)
    # lets a bigger batch beat tail-only@88.
    host_trees = {
        "int8": qparams,
        "int8_tail_only": qtail,
        "int8_trunk_only": quant.quantize_generator_params(
            params, only=is_trunk
        ),
        "int8_ups_only": quant.quantize_generator_params(
            params, only=lambda n: n.startswith("upsampling_")
        ),
        "int8_head_only": quant.quantize_generator_params(
            params, only=lambda n: n == "head_conv"
        ),
    }
    # fidelity of every requested int8 arm (fp32 glue, uint8 output domain)
    psnr_by_arm = {
        name: round(psnr_by_arm.get(name) or psnr_of(tree), 2)
        for name, tree in host_trees.items()
        if name in wanted
    }
    # percentile-calibration quality ladder on the production (ups) arm
    psnr_percentile = None
    if args.psnr_percentiles:
        ups = host_trees["int8_ups_only"]
        s_max = quant.calibrate_scales(
            params, [xq], scale_factor=sf, percentile=None
        )
        psnr_percentile = {
            "default": round(psnr_of(ups), 2),  # quant.DEFAULT_PERCENTILE
            "maxabs": round(psnr_of(ups, s_max), 2),
        }
        for qs in args.psnr_percentiles.split(","):
            s_q = quant.calibrate_scales(
                params, [xq], scale_factor=sf, percentile=float(qs)
            )
            psnr_percentile[qs] = round(psnr_of(ups, s_q), 2)
    # calibration-source A/B on the production arm: synthetic batch vs the
    # evaluation frames themselves (what video int8 calibrating on its
    # first decoded frames buys — fast_srgan_tpu/video.py upscale_videos)
    calib_ab = None
    if args.calib_ab:
        ups = host_trees["int8_ups_only"]
        if args.calib_ab == "synthetic":
            # procedural "clip": temporally-correlated frames — a panning
            # window over one natural-statistics master image, plus sensor
            # noise; video-like content the default batch never saw
            crng = np.random.default_rng(42)
            yy, xx = np.mgrid[0 : h + 64, 0 : w + 64].astype(np.float32)
            master = (
                110 + 70 * np.sin(yy / 37) * np.cos(xx / 53)
                + 40 * np.sign(np.sin(yy / 9 + xx / 17))
                + 12 * crng.standard_normal(yy.shape)
            )
            master = np.clip(master, 0, 255)
            frames = []
            for t in range(8):
                win = master[4 * t : 4 * t + h, 8 * t : 8 * t + w]
                f = np.stack(
                    [
                        np.clip(
                            win + 6 * crng.standard_normal(win.shape), 0, 255
                        )
                        for _ in range(3)
                    ],
                    -1,
                )
                frames.append(f.astype(np.uint8))
        else:
            from fast_srgan_tpu.utils.images import (
                list_image_files,
                load_image_u8,
            )

            frames = [
                load_image_u8(os.path.join(args.calib_ab, n))
                for n in list_image_files(args.calib_ab)[:8]
            ]
        xe = quant.calibration_batch_from_images(frames, max_h=h, max_w=w)
        if xe is None:
            raise SystemExit(f"--calib_ab: no usable frames in {args.calib_ab}")
        ups_scales = {
            "synthetic_batch": scales,
            "real_frames": quant.calibrate_scales(
                params, [xe], scale_factor=sf
            ),
        }
        ref_e = quant.sr_float_forward(params, xe, scale_factor=sf)

        def psnr_on(s):
            out = quant.sr_quant_forward(
                ups, s, xe, scale_factor=sf, glue_dtype=jnp.float32
            )
            mse = float(np.mean((u8(ref_e) - u8(out)) ** 2))
            return round(10 * np.log10(255.0**2 / max(mse, 1e-12)), 2)

        ab = {k: psnr_on(s) for k, s in ups_scales.items()}
        ab["delta_db"] = round(ab["real_frames"] - ab["synthetic_batch"], 2)
        calib_ab = ab
        print(f"# calib_ab: {json.dumps(ab)}", file=sys.stderr, flush=True)
    trees = {
        name: jax.device_put(tree)
        for name, tree in host_trees.items()
        if name in wanted
    }
    batches = [int(b) for b in str(args.batch).split(",")]
    arms = {}
    for b in batches:
        row = {}
        if "bf16" in wanted:
            row["bf16"] = arm(fwd_bf16, lambda x: (params_d, x), b)
        for name, tree in trees.items():
            if name not in wanted:
                continue
            row[name] = arm(fwd_int8, lambda x: (tree, scales_d, x), b)
        arms[b] = row
        # partial results to stderr as each batch row lands: a crashed or
        # killed sweep must not lose the rows already measured
        print(f"# batch {b}: {json.dumps(row)}", file=sys.stderr, flush=True)
    best = lambda k: max(
        (a[k]["fps"] for a in arms.values() if "fps" in a.get(k, {})),
        default=None,
    )
    fb = best("bf16")
    # best int8 across whichever quantized arms ran — a sweep restricted
    # to the production arm (--arms bf16,int8_ups_only) must still report
    # best_fps_int8/speedup instead of null
    fi = max(
        (f for k in host_trees if (f := best(k)) is not None),
        default=None,
    )
    result = {
        "device": str(jax.devices()[0].device_kind),
        "checkpoint": ckpt,
        "shape": args.shape,
        "glue": args.glue,
        "psnr_int8_vs_fp32_u8_db": round(psnr, 2),
        "psnr_int8_tail_only_vs_fp32_u8_db": round(psnr_tail, 2),
        "psnr_by_arm": psnr_by_arm,
        "psnr_percentile": psnr_percentile,
        "calib_ab": calib_ab,
        "arms": arms,
        "best_fps_bf16": fb,
        "best_fps_int8": fi,
        "speedup_int8_over_bf16": (
            round(fi / fb, 3) if fb and fi else None
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
