#!/usr/bin/env python
"""Standalone PSNR/SSIM evaluation of a checkpoint over an image directory.

The reference computes PSNR/SSIM only inside training (trainer.py:53-69, on
random crops of the training images). This CLI evaluates any checkpoint with
the standard SR protocol on whole images: HR ground truth -> bicubic-
antialias x4 downsample (the training degradation, dataloader.py:15-19) ->
generator -> PSNR/SSIM vs ground truth on [0,1] images.

    python scripts/evaluate.py --image_dir DIV2K_valid_HR \
        [--checkpoint models/generator_pretrained.npz] [--crop 192] [--fp32]

Images are center-cropped to a multiple of 4 (or to --crop) so LR synthesis
is exact. Prints per-image and aggregate PSNR / mean SSIM.

``--y_channel`` switches to the SR literature's benchmark protocol —
PSNR/SSIM on the matlab-convention BT.601 luma with a shaved border
(``--shave``, default = the scale factor when --y_channel is given) — so
results are comparable with published Set5/Set14/BSD100/DIV2K tables
(SRGAN/ESRGAN evaluation convention). Default (RGB, no shave) matches the
reference's training-time metric domain (trainer.py:53-69).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fast_srgan_tpu.metrics.psnr_ssim import (  # noqa: E402
    luma_bt601,
    psnr_from_accumulator,
    ssim_per_image,
)
from fast_srgan_tpu.models import Generator  # noqa: E402
from fast_srgan_tpu.ops.resize import resize_bicubic_nhwc  # noqa: E402
from fast_srgan_tpu.utils import jax_cache  # noqa: E402
from fast_srgan_tpu.utils.images import list_image_files, load_image_u8  # noqa: E402

jax_cache.enable()


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image_dir", required=True)
    parser.add_argument("--checkpoint", default="models/generator_pretrained.npz")
    parser.add_argument("--crop", type=int, default=0,
                        help="center-crop HR to this size (0 = full image)")
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument(
        "--y_channel", action="store_true",
        help="metrics on matlab-convention BT.601 luma instead of RGB "
        "(the SR literature's Set5/Set14/DIV2K benchmark protocol)",
    )
    parser.add_argument(
        "--shave", type=int, default=None,
        help="crop this many border pixels before metrics (literature "
        "protocol: the scale factor). Default: 0, or scale with "
        "--y_channel",
    )
    parser.add_argument(
        "--n_filters", type=int, default=None,
        help="override the architecture read from the checkpoint",
    )
    parser.add_argument("--n_layers", type=int, default=None)
    args = parser.parse_args()

    from infer import load_generator_params
    from fast_srgan_tpu.inference import arch_from_params

    params = load_generator_params(args.checkpoint)
    arch = arch_from_params(params)
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    scale = arch["scale_factor"]
    model = Generator(
        n_filters=args.n_filters if args.n_filters is not None
        else arch["n_filters"],
        n_layers=args.n_layers if args.n_layers is not None
        else arch["n_layers"],
        scale_factor=scale,
        dtype=dtype,
    )

    import jax

    shave = args.shave
    if shave is None:
        shave = scale if args.y_channel else 0

    # params passed as a jit argument (not closed over): closure constants
    # get baked into every compiled program, duplicating the weights per
    # distinct image resolution in the compile cache.
    @jax.jit
    def evaluate(p, hr_u8):
        hr = hr_u8.astype(jnp.float32)
        h, w = hr.shape[1], hr.shape[2]
        lr = resize_bicubic_nhwc(hr, h // scale, w // scale) / 127.5 - 1.0
        sr01 = (model.apply(p, lr) + 1.0) / 2.0
        sr01 = jnp.clip(sr01, 0.0, 1.0)
        hr01 = hr / 255.0
        if args.y_channel:
            sr01, hr01 = luma_bt601(sr01), luma_bt601(hr01)
        if shave:
            sr01 = sr01[:, shave:-shave, shave:-shave]
            hr01 = hr01[:, shave:-shave, shave:-shave]
        diff = sr01 - hr01
        return jnp.sum(diff * diff), ssim_per_image(sr01, hr01)[0]

    names = list_image_files(args.image_dir)
    if not names:
        raise SystemExit(f"no images in {args.image_dir}")
    sse_total = n_total = ssim_total = 0.0
    for name in names:
        img = load_image_u8(os.path.join(args.image_dir, name))
        h, w = img.shape[:2]
        if args.crop:
            # floor the requested crop to a multiple of the scale so LR
            # synthesis and the upscaled output tile exactly
            ch = cw = (min(args.crop, min(h, w)) // scale) * scale
        else:
            ch, cw = (h // scale) * scale, (w // scale) * scale
        top, left = (h - ch) // 2, (w - cw) // 2
        crop = img[top : top + ch, left : left + cw]
        sse, ssim = evaluate(params, jnp.asarray(crop[None]))
        # element count of the measured tensor (post-luma, post-shave)
        n = (ch - 2 * shave) * (cw - 2 * shave) * (1 if args.y_channel else 3)
        psnr = psnr_from_accumulator(float(sse), float(n))
        print(f"{name:<28} PSNR {psnr:6.2f} dB   SSIM {float(ssim):.4f}")
        sse_total += float(sse)
        n_total += n
        ssim_total += float(ssim)

    print("-" * 56)
    print(
        f"{'aggregate':<28} PSNR {psnr_from_accumulator(sse_total, n_total):6.2f} dB"
        f"   SSIM {ssim_total / len(names):.4f}   ({len(names)} images)"
    )


if __name__ == "__main__":
    main()
