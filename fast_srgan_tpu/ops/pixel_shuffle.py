"""Pixel shuffle (depth-to-space) in NHWC with PyTorch channel semantics.

The reference upsampling path is ``Conv2d(F -> 4F) -> PixelShuffle(2) -> PReLU``
(/root/reference/model.py:26-40). PyTorch's PixelShuffle on NCHW places the
sub-pixel offsets in the *fastest-varying* position of the channel index:

    out[b, c, h*r + i, w*r + j] = in[b, c*r*r + i*r + j, h, w]

For checkpoint compatibility the NHWC equivalent must keep exactly this
channel ordering: after an OIHW->HWIO kernel transpose the conv output channel
index is unchanged, so interpreting the last axis as (C, r, r) reproduces the
PyTorch pixel arrangement bit-for-bit. XLA lowers the reshape/transpose pair to
a single layout change fused with the surrounding convolution.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle_nhwc(x: jnp.ndarray, upscale_factor: int = 2) -> jnp.ndarray:
    """Rearrange [B, H, W, C*r^2] -> [B, H*r, W*r, C], torch-compatible order."""
    r = upscale_factor
    b, h, w, c4 = x.shape
    c = c4 // (r * r)
    if c * r * r != c4:
        raise ValueError(f"channels {c4} not divisible by r^2={r * r}")
    # Last axis interpreted as (C, i, j) — matches torch's c*r*r + i*r + j.
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, H, i, W, j, C]
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle_nhwc(x: jnp.ndarray, downscale_factor: int = 2) -> jnp.ndarray:
    """Inverse of :func:`pixel_shuffle_nhwc` (space-to-depth)."""
    r = downscale_factor
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, H, W, C, i, j]
    return x.reshape(b, h, w, c * r * r)
