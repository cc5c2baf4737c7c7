"""Fused instance-norm + PReLU Pallas kernel.

The generator's residual stem executes `InstanceNorm -> PReLU` after every
first conv and `InstanceNorm (+ residual add)` after every second conv
(reference model.py:43-69) — 2 norms x n_layers per forward. XLA lowers each
as a reduce pass plus a normalize pass over HBM, with the PReLU as another
elementwise pass when it doesn't fuse into the next conv. This kernel keeps
one sample's [H*W, C] activation resident in VMEM and does
stats -> normalize -> PReLU in a single read/write of HBM.

Layout: grid over the batch; block [1, H*W, C] with C in lanes (C=64 for the
flagship model — half a lane register, acceptable) and H*W in sublanes. The
fp32 statistics use the VPU; `lax.rsqrt` for the reciprocal sqrt.

Fallback: shapes whose [H*W, C] block exceeds the VMEM budget dispatch to the
`lax` composition (trace-time static-shape check). Training gradients use a
custom VJP whose backward differentiates the reference composition — the
backward graph is conv-adjacent and XLA-fuses well; the Pallas win is the
forward's HBM traffic.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_srgan_tpu.ops.norm import instance_norm_nhwc

_EPS = 1e-5
# Mosaic's measured scoped-VMEM footprint for this kernel is ~20 bytes per
# block element for bf16 input (in + out + ~4 fp32 temporaries): a
# 16x14400x64 bf16 call was reported as a 20.93 MB scoped allocation.
# Budget well under the 16 MB/core VMEM with headroom for the surrounding
# program.
_BYTES_PER_ELEM_BF16 = 20
_MAX_SCOPED_VMEM_BYTES = 10 * 1024 * 1024


def _reference_impl(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """lax composition: the numerical contract for the kernel."""
    y = instance_norm_nhwc(x, eps=_EPS)
    a = alpha.astype(y.dtype)
    return jnp.where(y >= 0, y, a * y)


def _kernel(x_ref, alpha_ref, o_ref):
    x32 = x_ref[...].astype(jnp.float32)  # [1, HW, C]
    mean = jnp.mean(x32, axis=1, keepdims=True)
    centered = x32 - mean
    var = jnp.mean(centered * centered, axis=1, keepdims=True)
    y = centered * lax.rsqrt(var + _EPS)
    a = alpha_ref[0, 0]
    y = jnp.where(y >= 0.0, y, a * y)
    o_ref[...] = y.astype(o_ref.dtype)


def _pallas_forward(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    hw = h * w
    x3 = x.reshape(b, hw, c)
    alpha2 = alpha.reshape(1, 1).astype(jnp.float32)
    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
    )(x3, alpha2)
    return out.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Chunked double-buffered variant: any activation size, tiny VMEM footprint
# ---------------------------------------------------------------------------
#
# DMA slices must be lane-aligned (last dim multiple of 128), so the [HW, C]
# activation is viewed as [HW/fold, 128] with fold = 128/C consecutive pixels
# packed per 128-lane row. Per-channel statistics are recovered with lane
# rolls: after s += roll(s, shift) for shift = C, 2C, ..., 64, every lane
# holds the total for its channel, already duplicated across the fold groups
# — exactly the layout needed to normalize the packed rows. Requires C to be
# a power of two <= 128 (the flagship model's C=64 qualifies).

_LANES = 128


def _largest_chunk(rows: int, sublane: int, cap: int = 2048) -> int:
    """Largest divisor of `rows` <= cap aligned to the sublane tile; 0 if none."""
    for d in range(min(cap, rows), sublane - 1, -1):
        if rows % d == 0 and d % sublane == 0:
            return d
    return 0


def _make_chunked_kernel(rows: int, chunk: int, c: int, hw: int):
    n_chunks = rows // chunk

    def kernel(x_hbm, alpha_ref, o_hbm, buf, obuf, sem_in, sem_out):
        i = pl.program_id(0)

        def get_in(slot, k):
            return pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(k * chunk, chunk), :],
                buf.at[slot],
                sem_in.at[slot],
            )

        def put_out(slot, k):
            return pltpu.make_async_copy(
                obuf.at[slot],
                o_hbm.at[i, pl.ds(k * chunk, chunk), :],
                sem_out.at[slot],
            )

        # ---- pass 1: accumulate packed-lane sum / sumsq ----
        get_in(0, 0).start()

        def stats_body(k, acc):
            s, q = acc
            slot = k % 2

            @pl.when(k + 1 < n_chunks)
            def _():
                get_in((k + 1) % 2, k + 1).start()

            get_in(slot, k).wait()
            x32 = buf[slot].astype(jnp.float32)
            s = s + jnp.sum(x32, axis=0, keepdims=True)
            q = q + jnp.sum(x32 * x32, axis=0, keepdims=True)
            return s, q

        zero = jnp.zeros((1, _LANES), jnp.float32)
        s, q = jax.lax.fori_loop(0, n_chunks, stats_body, (zero, zero))

        # Fold lane groups so each lane carries its channel's global total.
        shift = c
        while shift < _LANES:
            s = s + pltpu.roll(s, shift, axis=1)
            q = q + pltpu.roll(q, shift, axis=1)
            shift *= 2

        mean = s / hw
        # E[x^2]-E[x]^2 cancels in fp32 for near-constant channels; without
        # the clamp, var can go slightly negative and rsqrt returns NaN.
        var = jnp.maximum(q / hw - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + _EPS)
        a = alpha_ref[0, 0]

        # ---- pass 2: normalize + PReLU, streamed back out ----
        get_in(0, 0).start()

        def norm_body(k, _):
            slot = k % 2

            @pl.when(k + 1 < n_chunks)
            def _():
                get_in((k + 1) % 2, k + 1).start()

            get_in(slot, k).wait()

            # Reusing the out-slot: wait for the previous store from it.
            @pl.when(k >= 2)
            def _():
                put_out(slot, k - 2).wait()

            y = (buf[slot].astype(jnp.float32) - mean) * inv
            y = jnp.where(y >= 0.0, y, a * y)
            obuf[slot] = y.astype(obuf.dtype)
            put_out(slot, k).start()
            return 0

        jax.lax.fori_loop(0, n_chunks, norm_body, 0)
        for tail in range(2):
            k = n_chunks - 1 - tail

            @pl.when(k >= 0)
            def _():
                put_out(k % 2, k).wait()

    return kernel


def _pallas_forward_chunked(
    x: jnp.ndarray, alpha: jnp.ndarray, chunk: int
) -> jnp.ndarray:
    b, h, w, c = x.shape
    hw = h * w
    fold = _LANES // c
    rows = hw // fold
    x3 = x.reshape(b, rows, _LANES)
    alpha2 = alpha.reshape(1, 1).astype(jnp.float32)
    out = pl.pallas_call(
        _make_chunked_kernel(rows, chunk, c, hw),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, DMA'd
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, rows, _LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, _LANES), x.dtype),
            pltpu.VMEM((2, chunk, _LANES), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x3, alpha2)
    return out.reshape(b, h, w, c)


def _fits_vmem(x: jnp.ndarray) -> bool:
    _, h, w, c = x.shape
    per_elem = 2 * x.dtype.itemsize + 16  # in+out + 4 fp32 temps
    return h * w * c * per_elem <= _MAX_SCOPED_VMEM_BYTES


@jax.custom_vjp
def instance_norm_prelu_nhwc(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Fused IN+PReLU. [B, H, W, C] x, scalar-shaped (1,) alpha.

    Dispatch (trace-time, static shapes): small activations use the
    whole-block kernel; anything larger uses the chunked double-buffered DMA
    kernel (any size, ~2*chunk*C VMEM); non-TPU backends and unchunkable
    HW factorizations use the lax composition.
    """
    if jax.default_backend() != "tpu":
        return _reference_impl(x, alpha)
    if _fits_vmem(x):
        return _pallas_forward(x, alpha)
    c = x.shape[3]
    if c > _LANES or (c & (c - 1)) != 0:  # need a power of two <= 128
        return _reference_impl(x, alpha)
    fold = _LANES // c
    hw = x.shape[1] * x.shape[2]
    if hw % fold != 0:
        return _reference_impl(x, alpha)
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    chunk = _largest_chunk(hw // fold, sublane)
    if chunk == 0:
        return _reference_impl(x, alpha)
    return _pallas_forward_chunked(x, alpha, chunk)


def _fwd(x, alpha):
    return instance_norm_prelu_nhwc(x, alpha), (x, alpha)


def _bwd(residuals, g):
    x, alpha = residuals
    _, vjp = jax.vjp(_reference_impl, x, alpha)
    return vjp(g)


instance_norm_prelu_nhwc.defvjp(_fwd, _bwd)
