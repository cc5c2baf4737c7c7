"""Bicubic (anti-aliased) resize as two MXU matmuls.

The reference synthesizes LR training inputs by bicubic+antialias downsampling
of HR crops with ``torchvision.transforms.v2.Resize`` (/root/reference/
dataloader.py:15-19,34) and renders the "Bicubic" comparison panel with
``F.interpolate(scale_factor=4, mode="bicubic", antialias=True)``
(/root/reference/trainer.py:74-76). Training parity therefore requires a
bit-matching resize.

TPU-first design: separable resampling is a pair of small dense matmuls
``LR = M_h @ HR @ M_w^T`` applied per (batch, channel). The sampling-weight
matrices are precomputed on host with float64 (PIL/torch "separable upsample"
algorithm: triangle of cubic-kernel taps, support scaled by the downscale
factor, rows normalized), cached per (in, out, antialias) signature, and the
einsums hit the MXU — the whole resize fuses into the jitted train step, so LR
synthesis happens on device and only uint8 HR crops cross PCIe.

Algorithm matches ATen's ``_upsample_bicubic2d_aa`` (the PIL-derived separable
resampler):
    scale   = in / out
    support = 2 * max(scale, 1)
    center  = scale * (i + 0.5)
    taps j in [floor(center - support + 0.5), ...), weights
    w_j = cubic((j + xmin - center + 0.5) / max(scale, 1)), normalized.
Kernel coefficient: the antialias path uses PIL's A=-0.5 (for upscaling too —
verified against torch: the AA upsample differs from plain bicubic and matches
A=-0.5 with unscaled support); the plain bicubic path uses torch's A=-0.75.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic convolution kernel (A=-0.5 for PIL/AA, A=-0.75 for torch)."""
    x = np.abs(x)
    out = np.zeros_like(x)
    m1 = x < 1.0
    m2 = (x >= 1.0) & (x < 2.0)
    out[m1] = ((a + 2.0) * x[m1] - (a + 3.0)) * x[m1] * x[m1] + 1.0
    out[m2] = (((x[m2] - 5.0) * x[m2] + 8.0) * x[m2] - 4.0) * a
    return out


@functools.lru_cache(maxsize=256)
def bicubic_resize_matrix(
    in_size: int, out_size: int, antialias: bool = True
) -> np.ndarray:
    """Dense [out_size, in_size] float32 resampling matrix along one axis."""
    scale = in_size / out_size
    kscale = max(scale, 1.0) if antialias else 1.0
    a = -0.5 if antialias else -0.75
    support = 2.0 * kscale
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = scale * (i + 0.5)
        if antialias:
            # PIL/ATen _upsample_bicubic2d_aa: out-of-range taps are
            # DROPPED and the remaining weights renormalized.
            xmin = max(0, int(center - support + 0.5))
            xmax = min(in_size, int(center + support + 0.5))
            j = np.arange(xmin, xmax, dtype=np.float64)
            w = _cubic((j - center + 0.5) / kscale, a)
            s = w.sum()
            if s != 0.0:
                w = w / s
            mat[i, xmin:xmax] = w
        else:
            # torch plain bicubic (upsample_bicubic2d): source indices are
            # CLAMPED (border replicate), weights kept as-is — different
            # border semantics from the AA path above.
            lo = int(np.floor(center - support + 0.5))
            hi = int(np.floor(center + support + 0.5))
            j = np.arange(lo, hi, dtype=np.float64)
            w = _cubic(j - center + 0.5, a)
            idx = np.clip(j.astype(np.int64), 0, in_size - 1)
            np.add.at(mat[i], idx, w)
    return mat.astype(np.float32)


def resize_bicubic_nhwc(
    x: jnp.ndarray, out_h: int, out_w: int, antialias: bool = True
) -> jnp.ndarray:
    """Bicubic resize of [B, H, W, C] to [B, out_h, out_w, C] via matmuls."""
    _, h, w, _ = x.shape
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    # HIGHEST: TPU fp32 contractions are bf16-decomposed at default
    # precision (3-pass), which would break the module's torch-parity
    # contract for synthesized training LR; full-fp32 here costs ~nothing
    # (the matrices are tiny) and keeps the resize bit-comparable.
    hp = jax.lax.Precision.HIGHEST
    if h != out_h:
        mh = jnp.asarray(bicubic_resize_matrix(h, out_h, antialias))
        x32 = jnp.einsum("oh,bhwc->bowc", mh, x32, precision=hp)
    if w != out_w:
        mw = jnp.asarray(bicubic_resize_matrix(w, out_w, antialias))
        x32 = jnp.einsum("ow,bhwc->bhoc", mw, x32, precision=hp)
    return x32.astype(dtype)
