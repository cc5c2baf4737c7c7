"""DMA-only Pallas pixel shuffle (the generator's measured copy tax).

Device traces show ~24 ms of the 71 ms flagship batch is XLA `copy` ops:
the PixelShuffle reshape/transpose materializing the 2x/4x-res tensors.
Three graph-level rewrites (transposed conv, phase-major reorder, plain
transpose reassociation) were measured and lost — XLA's lowering of the
row-interleave transpose is the bottleneck, so this kernel hand-writes it
as pure strided DMA:

  1. The upsample conv's output channels are permuted to *phase-major*
     order, ch' = i*(2C) + j*C + c (a free, exact re-parameterization:
     permuting conv output channels == permuting its kernel/bias).
  2. With that ordering, shuffled row 2h+i is byte-identical to lane-half i
     of input row h:  out[b, 2h+i, w, jC+c] = x[b, h, w, i*2C + jC+c],
     and the column interleave (2w+j, c) is a *free* row-major reshape
     [W, 2C] -> [2W, C].
  3. So the whole shuffle is, per (b, h): two HBM->HBM DMA copies of the
     128-lane-aligned halves of a row — no compute, no relayout — followed
     by a metadata-only reshape.

Requires r=2 and C*r^2 a multiple of 256 with the half-row slice aligned to
128 lanes (C multiple of 64; the flagship C=64 qualifies). Falls back to
the jnp composition elsewhere. Forward-only op.

MEASURED STATUS (v5e, 16x180x320 bf16 generator): numerically exact
(0.0 err in interpreter; 2e-3 end-to-end from conv-algorithm reordering)
but end-to-end SLOWER than XLA (93.4 ms vs 71.7 ms even with an 8-deep
pipelined DMA window). Root cause: XLA's "copy" ops were already fused
with the adjacent PReLU / conv operand reads; an opaque custom call adds
materialization boundaries that cost more than the copy it removes. The
op stays as tested infrastructure — the actual win requires fusing
conv+shuffle+PReLU into ONE Mosaic MXU kernel (future work), for which
this file's phase-major layout algebra is the output-stage design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_srgan_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc

_LANES = 128


def phase_major_permutation(c4: int) -> np.ndarray:
    """perm such that K[..., perm] orders output channels (i, j, c)-major
    from torch's (c, i, j)-major (ch = c*4 + 2i + j)."""
    c = c4 // 4
    perm = np.empty(c4, np.int64)
    for i in range(2):
        for j in range(2):
            for ch in range(c):
                perm[i * 2 * c + j * c + ch] = ch * 4 + 2 * i + j
    return perm


_DMA_LAG = 8  # in-flight row-copy window (pipelines HBM->HBM DMAs)


def _make_dma_kernel(n_rows: int):
    def kernel(x_hbm, o_hbm, sems):
        b = pl.program_id(0)
        c2 = x_hbm.shape[-1] // 2

        def copies(h, slot):
            c0 = pltpu.make_async_copy(
                x_hbm.at[b, h, :, 0:c2], o_hbm.at[b, 2 * h, :, :],
                sems.at[slot, 0],
            )
            c1 = pltpu.make_async_copy(
                x_hbm.at[b, h, :, c2 : 2 * c2], o_hbm.at[b, 2 * h + 1, :, :],
                sems.at[slot, 1],
            )
            return c0, c1

        def body(h, _):
            # Retire the copies issued _DMA_LAG rows ago before reusing
            # their semaphore slot; everything in between stays in flight.
            @pl.when(h >= _DMA_LAG)
            def _():
                old0, old1 = copies(h - _DMA_LAG, h % _DMA_LAG)
                old0.wait()
                old1.wait()

            new0, new1 = copies(h, h % _DMA_LAG)
            new0.start()
            new1.start()
            return 0

        jax.lax.fori_loop(0, n_rows, body, 0)
        for tail in range(min(_DMA_LAG, n_rows)):
            h = n_rows - 1 - tail

            @pl.when(h >= 0)
            def _():
                t0, t1 = copies(h, h % _DMA_LAG)
                t0.wait()
                t1.wait()

    return kernel


def pixel_shuffle_phase_major_dma(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 4C] phase-major -> [B, 2H, 2W, C] via pipelined DMA."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    out = pl.pallas_call(
        _make_dma_kernel(h),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, w, 2 * c), x.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_DMA_LAG, 2))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)
    # Row-major [W, 2C] -> [2W, C] is metadata-only.
    return out.reshape(b, 2 * h, 2 * w, c)


def fast_pixel_shuffle_from_torch_order(x: jnp.ndarray) -> jnp.ndarray:
    """Drop-in replacement for pixel_shuffle_nhwc(x, 2) on TPU.

    Accepts torch-ordered channels (the checkpoint convention) and performs
    the phase-major permutation as part of the op. Intended use is on a conv
    OUTPUT — prefer permuting the conv kernel once instead (see
    UpSamplingBlock) so the permutation is free; this wrapper exists for the
    generic case and tests.
    """
    if jax.default_backend() != "tpu" or x.shape[-1] % 256 != 0:
        return pixel_shuffle_nhwc(x, 2)
    perm = jnp.asarray(phase_major_permutation(x.shape[-1]))
    return pixel_shuffle_phase_major_dma(x[..., perm])
