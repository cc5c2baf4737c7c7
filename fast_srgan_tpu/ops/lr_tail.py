"""LR-domain upsampling tail: the whole 4x tail as LR-resolution convs.

The reference tail (/root/reference/model.py:26-40,97-110) is

    conv3x3(F->4F) -> PixelShuffle(2) -> PReLU          (at LR,  -> 2x res)
    conv3x3(F->4F) -> PixelShuffle(2) -> PReLU          (at 2x,  -> 4x res)
    conv3x3(F->3)  -> tanh                              (at 4x)

Profiling the straightforward lowering on v5e showed ~24 ms of a 71 ms
batch-16 forward going to `copy` ops: the two pixel-shuffle transposes
materialize the 2x- and 4x-resolution tensors, and the 64-channel convs at
2x/4x resolution only fill half of the MXU's 128-wide lane dimension.

This module computes the *same function* entirely at LR resolution:

  * A conv3x3 applied after PixelShuffle(2) is exactly equivalent to four
    per-phase conv2x2s at LR over the pre-shuffle (4F-channel) tensor. For
    output phase p (per spatial dim), HR taps 2h+p+d (d in -1..1) regroup as
    LR taps h+g with sub-pixel phase: p+d = 2g+i, so phase p reads the LR
    window {h+p-1, h+p} — a kernel-2 conv with asymmetric padding
    ((1-p, p), (1-q, q)). Each original tap lands in exactly one
    (window, input-phase) slot; the rest stay zero.
  * The PReLUs have a single shared slope (torch nn.PReLU() default,
    reference model.py:37,60), so they commute with pixel shuffle and apply
    directly to the phase-packed LR tensors.
  * The final conv3x3 at 4x resolution becomes one dense conv3x3 at LR over
    the 16F phase-packed channels, producing 48 = 3*16 channels ordered so
    that a single pixel_shuffle(4) yields the output — taps 4h+s+d regroup
    as s+d = 4g+t, all within one LR pixel of h.

Cost/benefit: stage-2 conv FLOPs rise 1.78x and head FLOPs 4x (the
phase-decomposed kernels are block-sparse but executed dense), ~+29% total
network FLOPs — but every contraction becomes MXU-shaped (1024-long input
contraction, 256/1024-wide outputs vs 64), no 2x/4x-resolution tensor is
ever materialized except the final output, and both pixel-shuffle copies
disappear. The transform is exact (pure kernel rearrangement): fp32 outputs
match `Generator.__call__` to float tolerance; see tests/test_lr_tail.py.

Inference-only by design (training keeps the canonical graph so checkpoints
and the GAN losses stay on the reference formulation). scale_factor=4 (the
reference's fixed factor and the shipped checkpoints) uses the full
two-stage decomposition below; scale_factor=2 uses the single-stage
analogue (:func:`lr_tail_2x`); scale_factor=8 runs hierarchically — stage 0
canonical to 2x, then the 4x transform at 2x res (:func:`lr_tail_8x`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from jax import lax

from fast_srgan_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x: jnp.ndarray, kernel: jnp.ndarray, padding) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=padding,
        dimension_numbers=_DN,
    )


def _phase_kernels_2x(k: jnp.ndarray) -> Dict[tuple, jnp.ndarray]:
    """[3,3,Cin,Cout] conv applied at 2x res after PixelShuffle(2) ->
    {(p, q): [2,2,4*Cin,Cout]} per-phase LR kernels.

    Input channel packing is pixel_shuffle_nhwc's: c*4 + iy*2 + ix.
    Phase (p, q) pairs with conv padding ((1-p, p), (1-q, q)).
    """
    _, _, cin, cout = k.shape
    kernels: Dict[tuple, jnp.ndarray] = {}
    for p in (0, 1):
        for q in (0, 1):
            kp = jnp.zeros((2, 2, 4 * cin, cout), k.dtype)
            for dy in (-1, 0, 1):
                t = p + dy
                iy, gi = t & 1, (t >> 1) - (p - 1)
                for dx in (-1, 0, 1):
                    s = q + dx
                    ix, gj = s & 1, (s >> 1) - (q - 1)
                    kp = kp.at[gi, gj, (iy * 2 + ix)::4, :].set(
                        k[dy + 1, dx + 1]
                    )
            kernels[(p, q)] = kp
    return kernels


def _head_kernel_4x(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,F,n] conv applied at 4x res -> one dense [3,3,16F,16n] LR kernel.

    Input channels are the phase-major concat of the four stage-2 phase
    outputs: (p*2+q)*4F + c*4 + i2*2 + j2, where the 4x row is
    4h + 2p + i2 (stage-1 shuffle contributes the high bit). Output channels
    are packed n*16 + sy*4 + sx so pixel_shuffle_nhwc(. , 4) finishes the job.
    """
    _, _, f, n = k.shape
    kd = jnp.zeros((3, 3, 16 * f, 16 * n), k.dtype)
    for sy in range(4):
        for sx in range(4):
            oc = sy * 4 + sx
            for dy in (-1, 0, 1):
                t = sy + dy
                ty, gi = t & 3, (t >> 2) + 1
                for dx in (-1, 0, 1):
                    s = sx + dx
                    tx, gj = s & 3, (s >> 2) + 1
                    p, i2 = ty >> 1, ty & 1
                    q, j2 = tx >> 1, tx & 1
                    base = (p * 2 + q) * 4 * f
                    kd = kd.at[
                        gi, gj,
                        (base + i2 * 2 + j2): (base + 4 * f): 4,
                        oc::16,
                    ].set(k[dy + 1, dx + 1])
    return kd


def _head_kernel_2x(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,F,n] conv applied at 2x res -> one dense [3,3,4F,4n] LR kernel.

    The scale_factor=2 analogue of :func:`_head_kernel_4x`: input channels
    are pixel_shuffle_nhwc's packing c*4 + iy*2 + ix of the (single)
    upsample stage's pre-shuffle tensor; output channels are packed
    n*4 + sy*2 + sx so pixel_shuffle_nhwc(., 2) finishes the job. HR taps
    2h + sy + dy regroup as LR taps h + gi - 1 with sub-pixel phase
    ty = (sy + dy) & 1, gi = ((sy + dy) >> 1) + 1.
    """
    _, _, f, n = k.shape
    kd = jnp.zeros((3, 3, 4 * f, 4 * n), k.dtype)
    for sy in range(2):
        for sx in range(2):
            oc = sy * 2 + sx
            for dy in (-1, 0, 1):
                t = sy + dy
                ty, gi = t & 1, (t >> 1) + 1
                for dx in (-1, 0, 1):
                    s = sx + dx
                    tx, gj = s & 1, (s >> 1) + 1
                    kd = kd.at[
                        gi, gj, (ty * 2 + tx)::4, oc::4
                    ].set(k[dy + 1, dx + 1])
    return kd


def lr_tail_2x(
    y: jnp.ndarray,
    params: Dict[str, Any],
    dtype: Any = jnp.float32,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Apply the 2x upsampling tail entirely at LR resolution.

    scale_factor=2 generators have a single upsample stage
    (conv F->4F -> PixelShuffle(2) -> PReLU) before the head; the stage-1
    conv already runs at LR verbatim, the shared-slope PReLU commutes with
    the shuffle, and the head conv3x3 at 2x res becomes one dense LR conv
    emitting all 4 sub-pixel phases — the final depth-to-space is the only
    layout copy. Exact (see tests/test_lr_tail.py).
    """
    up0 = params["upsampling_0"]
    head = params["head_conv"]
    y = y.astype(dtype)
    if mask is not None:
        mask = mask.astype(dtype)

    a1 = _conv(y, up0["conv"]["kernel"].astype(dtype), ((1, 1), (1, 1)))
    a1 = a1 + up0["conv"]["bias"].astype(dtype)
    if mask is not None:
        a1 = a1 * mask
    alpha1 = up0["relu"]["alpha"].astype(dtype)
    a1 = jnp.where(a1 >= 0, a1, alpha1 * a1)  # [B, H, W, 4F]

    kd = _head_kernel_2x(head["kernel"])
    z = _conv(a1, kd.astype(dtype), ((1, 1), (1, 1)))
    z = z + jnp.repeat(head["bias"], 4).astype(dtype)
    z = jnp.tanh(z.astype(jnp.float32))  # [B, H, W, 12]
    return pixel_shuffle_nhwc(z, 2)


def lr_tail_8x(
    y: jnp.ndarray,
    params: Dict[str, Any],
    dtype: Any = jnp.float32,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Apply the 8x upsampling tail with at most 2x-resolution tensors.

    Hierarchical decomposition: stage 0 runs canonically (conv at LR ->
    shuffle -> PReLU, producing the 2x-res trunk), then stages 1-2 + head
    are exactly the 4x two-stage transform (:func:`lr_tail`) evaluated at
    2x resolution with the param subtree shifted by one stage. The 4x- and
    8x-resolution intermediates — the bulk of the canonical tail's HBM
    traffic — are never materialized, and no new kernel scatters beyond
    the 4x transform's are needed (the direct single-level decomposition
    would take 16- and 64-phase scatters, ~1200 `.at[].set`s).

    Masked path: the 2x mask is the LR mask with each pixel repeated 2x2
    (valid region 2*vh x 2*vw). Masking the phase-packed 2x tensors equals
    masking the unpacked 4x/8x tensors because packed position (i, j)
    phase (p, q) is output position (2i+p, 2j+q): i < 2*vh iff
    2i+p < 4*vh. Exact (see tests/test_lr_tail.py).
    """
    up0 = params["upsampling_0"]
    y = y.astype(dtype)
    a0 = _conv(y, up0["conv"]["kernel"].astype(dtype), ((1, 1), (1, 1)))
    a0 = a0 + up0["conv"]["bias"].astype(dtype)
    if mask is not None:
        a0 = a0 * mask.astype(dtype)
    a0 = pixel_shuffle_nhwc(a0, 2)
    alpha0 = up0["relu"]["alpha"].astype(dtype)
    y2 = jnp.where(a0 >= 0, a0, alpha0 * a0)  # [B, 2H, 2W, F]

    mask2 = None
    if mask is not None:
        mask2 = jnp.repeat(jnp.repeat(mask, 2, axis=1), 2, axis=2)
    sub = {
        "upsampling_0": params["upsampling_1"],
        "upsampling_1": params["upsampling_2"],
        "head_conv": params["head_conv"],
    }
    # Pinned to the summed head: the 8x hierarchical tail runs the 4x
    # transform at 2x resolution, a shape class head_form_4x's 4x-geometry
    # measurements don't cover — keep the shipped form.
    return lr_tail(y2, sub, dtype=dtype, mask=mask2, head="summed")


#: LR-pixel threshold of the "memory-capped streaming" shape class (the
#: 4K frame, 540x960). Below it the phase-summed head's batch-cap lift is
#: worth 14-18%; at/above it with batch >= 2 the cap is ~8 either way and
#: the concat head's single dense contraction schedules ~3% better
#: (measured, scripts/bench_4k.py — docs/DESIGN.md "head policy").
CONCAT_HEAD_MIN_PIXELS = 540 * 960


def head_form_4x(batch: int, lr_pixels: int) -> str:
    """Measured head-form policy for the FLOAT 4x tail.

    Returns ``"summed"`` or ``"concat"`` from the program's static shape
    (batch, LR pixels per frame) — both are trace-time constants, so each
    compiled program gets exactly one form. The decision table (all v5e,
    docs/DESIGN.md):

    - summed lifts the HBM-capped batch (720p bf16: 529.6 fps @128 vs
      465 @96 concat) and wins single-frame latency (4K b1: 38.7 ms vs
      42.2) -> default everywhere;
    - at memory-capped streaming batches (>= 2 frames of >= 4K-class
      pixels, where the cap is ~8 regardless of form) the watermark cut
      buys nothing and the 4-conv split costs ~3% schedule efficiency:
      concat measured 34.7 fps vs summed 33.6 -> concat there.

    The int8 tier (quant._tail_4x) keeps the summed head unconditionally:
    it leads every measured row (docs/DESIGN.md mode-by-shape table).
    """
    if batch >= 2 and lr_pixels >= CONCAT_HEAD_MIN_PIXELS:
        return "concat"
    return "summed"


def lr_tail(
    y: jnp.ndarray,
    params: Dict[str, Any],
    dtype: Any = jnp.float32,
    mask: jnp.ndarray | None = None,
    head: str = "auto",
) -> jnp.ndarray:
    """Apply the 4x upsampling tail entirely at LR resolution.

    Args:
      y: trunk output [B, H, W, F] (Generator.__call__(..., trunk_only=True)).
      params: the Generator param tree (the ``"params"`` collection) — reads
        upsampling_0/, upsampling_1/, head_conv/ leaves unchanged; kernel
        rearrangement happens in-graph. Note: params are jit inputs, so the
        ~180 small scatters re-run every call — the price of a signature
        that stays drop-in for ``model.apply``. An engine-level A/B against
        host-precomputed kernels was indistinguishable from measurement
        noise (the 315-FPS headline includes the scatters), so the simpler
        form stays.
      dtype: compute dtype for the convolutions (params stay fp32).
      head: ``"summed"`` (phase-summed head — the [B,H,W,16F] concat is
        never materialized), ``"concat"`` (one dense head conv over the
        materialized concat), or ``"auto"`` (:func:`head_form_4x`, the
        measured per-shape-class policy). Both forms are exact vs the
        canonical graph (tests/test_lr_tail.py).

    Returns [B, 4H, 4W, 3] in [-1, 1], numerically the canonical tail.
    """
    up0, up1 = params["upsampling_0"], params["upsampling_1"]
    y = y.astype(dtype)

    if mask is not None:
        mask = mask.astype(dtype)

    # Stage 1: conv stays at LR verbatim; PReLU commutes with the shuffle.
    a1 = _conv(y, up0["conv"]["kernel"].astype(dtype), ((1, 1), (1, 1)))
    a1 = a1 + up0["conv"]["bias"].astype(dtype)
    if mask is not None:
        a1 = a1 * mask  # re-zero padding (the whole tail stays at LR, so
        # one LR mask serves every stage; PReLU keeps zeros zero)
    alpha1 = up0["relu"]["alpha"].astype(dtype)
    a1 = jnp.where(a1 >= 0, a1, alpha1 * a1)  # [B, H, W, 4F]

    if head == "auto":
        head = head_form_4x(y.shape[0], y.shape[1] * y.shape[2])
    if head not in ("summed", "concat"):
        raise ValueError(f"head must be 'summed'/'concat'/'auto': {head!r}")
    head_p = params["head_conv"]
    k2 = _phase_kernels_2x(up1["conv"]["kernel"]).items()
    b2 = up1["conv"]["bias"].astype(dtype)
    alpha2 = up1["relu"]["alpha"].astype(dtype)
    kd = _head_kernel_4x(head_p["kernel"])

    if head == "concat":
        # Stage 2: four per-phase conv2x2s, concatenated phase-major, then
        # ONE dense head contraction — the best schedule at memory-capped
        # streaming batches (head_form_4x).
        phases = [
            _conv(a1, kp.astype(dtype), ((1 - p, p), (1 - q, q))) + b2
            for (p, q), kp in k2
        ]
        a2 = jnp.concatenate(phases, axis=-1)  # [B, H, W, 16F]
        if mask is not None:
            a2 = a2 * mask
        a2 = jnp.where(a2 >= 0, a2, alpha2 * a2)
        z = _conv(a2, kd.astype(dtype), ((1, 1), (1, 1)))
        z = z + jnp.repeat(head_p["bias"], 16).astype(dtype)
        z = jnp.tanh(z.astype(jnp.float32))  # [B, H, W, 48]
        return pixel_shuffle_nhwc(z, 4)

    # Stage 2 + head, phase-summed: the head kernel's input channels are
    # phase-major and the stage-2 PReLU slope is a single shared scalar,
    # so conv(prelu(concat(phases)), Kd) == sum_p conv(prelu(phase_p),
    # Kd_p) with fp32 partial accumulation — the [B,H,W,16F] concat (the
    # program's HBM watermark: 13.2 GB at batch 112 x 180x320) is never
    # materialized. Measured (scripts/phase_summed_head_experiment.py,
    # v5e): the bf16 batch cap lifts ~104 -> 128+ and the 800-frame
    # operating point moves 465 fps @96 -> 531.9 @128; fp32 partials keep
    # the split 16F contraction at the one-conv form's precision (each
    # conv accumulates fp32 internally either way).
    f4 = a1.shape[-1]  # 4F
    z = None
    for i, ((p, q), kp) in enumerate(k2):
        ph = _conv(a1, kp.astype(dtype), ((1 - p, p), (1 - q, q))) + b2
        if mask is not None:
            ph = ph * mask
        ph = jnp.where(ph >= 0, ph, alpha2 * ph)
        part = lax.conv_general_dilated(
            ph, kd[:, :, i * f4 : (i + 1) * f4, :].astype(dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=_DN,
            preferred_element_type=jnp.float32,
        )
        z = part if z is None else z + part
    z = z + jnp.repeat(head_p["bias"], 16).astype(jnp.float32)
    z = jnp.tanh(z)  # [B, H, W, 48]
    return pixel_shuffle_nhwc(z, 4)


def generator_apply_lr_tail(
    model, variables: Dict[str, Any], x: jnp.ndarray, valid_hw=None,
    batch_divisor: int = 1,
) -> jnp.ndarray:
    """Drop-in for ``model.apply(variables, x)`` with the LR-domain tail.

    ``model`` is a Generator with scale_factor 2, 4, or 8; the param tree is
    the canonical one (no conversion step — rearrangement happens in-graph).
    ``valid_hw`` enables the exact zero-pad-masked forward (see
    Generator.__call__). 2x/4x run the whole tail at LR resolution;
    8x runs hierarchically with at most 2x-resolution tensors
    (:func:`lr_tail_8x`). The 4x head form follows the measured
    per-shape-class policy (:func:`head_form_4x`) — both forms exact.
    ``batch_divisor``: number of devices the batch dimension is sharded
    over (a data-parallel engine passes its mesh size). The head policy
    keys on the PER-DEVICE batch — a global batch-8 program on an
    8-device mesh computes one 4K frame per chip, the shape class where
    the summed head's latency win applies, not the memory-capped
    streaming class the global shape suggests.
    """
    if model.scale_factor not in (2, 4, 8):
        raise ValueError(
            "lr_tail supports scale_factor 2, 4, or 8 only "
            f"(got {model.scale_factor}); use the canonical forward"
        )
    y = model.apply(variables, x, trunk_only=True, valid_hw=valid_hw)
    mask = None
    if valid_hw is not None:
        from fast_srgan_tpu.ops.norm import valid_mask_nhwc

        mask, _ = valid_mask_nhwc(
            y.shape[1], y.shape[2], valid_hw[0], valid_hw[1]
        )
    if model.scale_factor == 4:
        head = head_form_4x(
            max(1, y.shape[0] // max(1, batch_divisor)),
            y.shape[1] * y.shape[2],
        )
        return lr_tail(
            y, variables["params"], dtype=model.dtype, mask=mask, head=head
        )
    tail = {2: lr_tail_2x, 8: lr_tail_8x}[model.scale_factor]
    return tail(y, variables["params"], dtype=model.dtype, mask=mask)
