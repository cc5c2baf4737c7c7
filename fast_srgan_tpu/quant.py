"""Int8 post-training-quantized inference tier.

Motivation (measured, scripts/int8_probe.py on v5e): the bf16 720p forward
sits at the roofline ridge — arithmetic intensity ~237 flop/byte vs machine
balance ~240 (docs/DESIGN.md "Roofline at the operating point") — so neither
more FLOPs nor more bandwidth alone helps. int8 halves *both* roofs: the MXU
runs int8 at ~2x the bf16 rate and the activations move half the bytes. The
probe at the generator's body shape (96x180x320x64, 3x3 convs, NHWC)
measured **1.82x** over bf16 with the full requantize epilogue (rescale,
round, clip, cast) fused in for free — but only 1.37x once float glue sits
between the convs, and end-to-end the win survives ONLY in the LR-domain
tail: full-graph int8 measures 0.87x, trunk-only 0.79x, tail-only 1.12x,
and **ups-only** (upsampling stages int8, trunk AND head float) wins —
with the phase-summed head (see :func:`_tail_4x`) **657.6 fps at batch
128** sustained-chain / 655.1 on the 800-frame protocol (BENCH_r04.json;
an early 623.4 predated the pixel-cap batch policy), vs the bf16
arm's 531.9/530.9 at the same batch. Keeping the head float shrinks the
program's widest live int32 buffer (the 1024-ch LR-domain head output)
and quantizes one fewer layer, raising fidelity (41.91 dB vs tail-only's
40.60 under the production 99.99th-percentile calibration). The
reconciled story is docs/DESIGN.md "int8 decision record". The
production policy is therefore ups-only
(``SRInferenceEngine(quantize=True)``); the tail/full/trunk modes remain
selectable as measured baselines.

Scheme — standard static PTQ, shaped to this network:

  * Every conv runs int8 x int8 -> int32 on the MXU: weights quantized
    per-output-channel symmetric (exact zero stays zero — the LR-tail's
    block-sparse phase/dense kernels scatter int8 values into int8 zeros),
    activations quantized per-tensor with **calibrated static scales**
    (:func:`calibrate_scales` runs the float forward over sample batches
    and records the 99.99th percentile of each conv input's |x| —
    :data:`DEFAULT_PERCENTILE`; clipping the outlier tail measured
    +1.8-2.4 dB over plain max-abs on held-out inputs).
  * Everything between convs stays float: instance norm (fp32 statistics,
    torch semantics — reference model.py:43-69 uses parameterless
    InstanceNorm2d), PReLU, pixel shuffle, tanh. These are
    bandwidth-cheap elementwise/stat ops that XLA fuses into the conv
    epilogues; `glue_dtype` (bf16 default) sets their storage dtype while
    all quantize/dequantize arithmetic stays fp32.
  * The upsampling tail is the LR-domain phase decomposition
    (ops/lr_tail.py) with int8 kernels: the phase-kernel builders are
    dtype-generic, so the quantized 3x3 kernels scatter directly and the
    per-output-channel dequant scales map through the same channel packing
    as the biases (repeat(16)/repeat(4) for the dense head).

The float mode of the same code path (:func:`sr_float_forward`) is the
calibration instrument AND the topology oracle: tests assert it matches
``Generator.apply`` + ``generator_apply_lr_tail`` to float tolerance, so
the quantized graph provably mirrors the real one.

Accuracy is a measured contract, not an assumption: tests/test_quant.py
bounds PSNR(int8, fp32) with the shipped pretrained weights, and
scripts/eval_int8.py reports the fidelity/speed trade on chip (results in
docs/DESIGN.md "int8 decision record"). The tier is inference-only and
opt-in (``SRInferenceEngine(quantize=True)``, ``infer.py --int8``,
``serve.py --int8``); training and checkpoints stay fp32 (the reference's
numerics, /root/reference/trainer.py, are never quantized).

The masked/bucketed exact forward composes with any FLOAT-TRUNK mode
(ups/tail; :func:`sr_quant_forward_masked`): the trunk runs the canonical
masked float path (per-sample valid-region IN statistics) and the int8
tail re-zeros padding like ops/lr_tail.py — the executor dispatches per
leaf, so the ups tree's float head simply runs as a float conv. Thus
``serve.py --int8`` buckets exactly like bf16 serving. Masked
'full'/'trunk' modes and the Pallas stem remain unsupported and are
rejected loudly by ``SRInferenceEngine``.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from fast_srgan_tpu.ops.lr_tail import (
    _head_kernel_2x,
    _head_kernel_4x,
    _phase_kernels_2x,
)
from fast_srgan_tpu.ops.norm import instance_norm_nhwc
from fast_srgan_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc

_DN = ("NHWC", "HWIO", "NHWC")
PAD1 = ((1, 1), (1, 1))


# -- weight quantization ------------------------------------------------------


_TRUNK_MODULES = ("neck_conv", "bottleneck_conv")


def is_trunk_module(name: str) -> bool:
    """Trunk = neck + residual stems + bottleneck (the IN-glued 64-ch body)."""
    return name in _TRUNK_MODULES or name.startswith("stem_")


def is_tail_module(name: str) -> bool:
    """Tail = the LR-domain upsampling stages + head (wide, no IN)."""
    return name.startswith("upsampling_") or name == "head_conv"


def is_ups_module(name: str) -> bool:
    """Upsampling stages only (the tail minus the head conv).

    The head's int8 form is what caps the tail-only batch at 88 on v5e
    (its int32 conv output is the widest live int32 buffer); keeping the
    head float lets the bf16-optimal batch 96 fit, and quantizing one
    fewer layer can only raise fidelity. scripts/eval_int8.py measures
    the trade (docs/DESIGN.md "int8 decision record")."""
    return name.startswith("upsampling_")


def _quantize_kernel(k: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[kh,kw,ci,co] fp32 -> (int8 kernel, fp32 dequant scale [co]).

    Symmetric per-output-channel: q = round(k / s), s = maxabs_co / 127.
    """
    k = jnp.asarray(k, jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_generator_params(
    params: Dict[str, Any], only=None
) -> Dict[str, Any]:
    """Generator param tree -> quantized tree (same topology).

    Each conv leaf ``{"kernel": f32, ["bias": f32]}`` becomes
    ``{"qkernel": int8, "wscale": f32[co], ["bias": f32]}``; PReLU alphas
    pass through unchanged. Accepts the tree with or without the flax
    ``{"params": ...}`` wrapper and returns the bare tree.

    ``only`` (optional predicate on the top-level module name) selects
    which modules quantize; the rest keep their float ``kernel`` leaves and
    the executor runs them as float convs (per-leaf dispatch). Used by
    scripts/eval_int8.py's trunk-only/tail-only diagnostic arms.
    """
    p = params["params"] if "params" in params else params
    out: Dict[str, Any] = {}
    for name, sub in p.items():
        if only is not None and not only(str(name)):
            out[name] = sub
            continue
        if name in ("neck_relu",) or str(name).endswith("relu"):
            out[name] = sub
            continue
        if "kernel" in sub:  # neck_conv, bottleneck_conv, head_conv
            q, s = _quantize_kernel(sub["kernel"])
            leaf = {"qkernel": q, "wscale": s}
            if "bias" in sub:
                leaf["bias"] = jnp.asarray(sub["bias"], jnp.float32)
            out[name] = leaf
            continue
        # stem_i / upsampling_i: nested conv + relu
        qsub: Dict[str, Any] = {}
        for k2, leaf2 in sub.items():
            if "kernel" in leaf2:
                q, s = _quantize_kernel(leaf2["kernel"])
                ql = {"qkernel": q, "wscale": s}
                if "bias" in leaf2:
                    ql["bias"] = jnp.asarray(leaf2["bias"], jnp.float32)
                qsub[k2] = ql
            else:
                qsub[k2] = leaf2  # relu alphas
        out[name] = qsub
    return out


# -- the unified forward ------------------------------------------------------
#
# One topology, three uses: float calibration (records per-conv-input
# max-abs), float oracle (must equal the canonical Generator+lr_tail), and
# the int8 serving path. The conv executor below dispatches on the leaf
# form ("kernel" = float, "qkernel" = int8).


def _quantize_act(x, scale):
    xf = x.astype(jnp.float32)
    return jnp.clip(jnp.round(xf * (127.0 / scale)), -127, 127).astype(
        jnp.int8
    )


class _Exec:
    """Conv executor: float (optionally collecting calibration stats) or
    int8, chosen by the kernel leaf's form."""

    def __init__(self, scales, collect, glue_dtype, collect_q=None):
        self.scales = scales
        self.collect = collect
        self.glue = glue_dtype
        self.collect_q = collect_q  # None = max-abs; else |x| percentile

    def observe(self, name, x):
        if self.collect is not None:
            ax = jnp.abs(x.astype(jnp.float32))
            if self.collect_q is None:
                m = jnp.max(ax)
            else:
                m = jnp.percentile(ax, self.collect_q)
            prev = self.collect.get(name)
            self.collect[name] = m if prev is None else jnp.maximum(prev, m)

    def qin(self, name, x):
        """Quantize a conv input once (shared by the phase convs)."""
        self.observe(name, x)
        return _quantize_act(x, self.scales[name])

    def conv_q(self, xq, name, qkernel, wscale, padding):
        y = lax.conv_general_dilated(
            xq, qkernel, (1, 1), padding, dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
        s = self.scales[name]
        return (
            y.astype(jnp.float32) * (wscale * (s / 127.0))
        ).astype(self.glue)

    def conv(self, x, name, leaf, padding, kernel_tf=None, wscale_tf=None):
        """One conv from a param leaf; kernel_tf rearranges the kernel
        (phase/dense scatter), wscale_tf maps the per-out-channel scales
        through the same output packing."""
        if "qkernel" in leaf:
            k = leaf["qkernel"]
            if kernel_tf is not None:
                k = kernel_tf(k)
            ws = leaf["wscale"]
            if wscale_tf is not None:
                ws = wscale_tf(ws)
            return self.conv_q(self.qin(name, x), name, k, ws, padding)
        self.observe(name, x)
        k = leaf["kernel"].astype(self.glue)  # float conv at glue dtype
        if kernel_tf is not None:
            k = kernel_tf(k)
        return lax.conv_general_dilated(
            x, k, (1, 1), padding, dimension_numbers=_DN
        ).astype(self.glue)


def _prelu(x, alpha, dtype):
    a = alpha.astype(dtype)
    return jnp.where(x >= 0, x, a * x)


def _trunk(p, ex, x):
    dt = ex.glue
    r = ex.conv(x, "neck", p["neck_conv"], PAD1)
    r = r + p["neck_conv"]["bias"].astype(dt)
    r = _prelu(r, p["neck_relu"]["alpha"], dt)

    n_layers = sum(1 for k in p if str(k).startswith("stem_"))
    y = r
    for i in range(n_layers):
        blk = p[f"stem_{i}"]
        h = ex.conv(y, f"stem_{i}_c1", blk["conv1"], PAD1)
        h = instance_norm_nhwc(h).astype(dt)
        h = _prelu(h, blk["relu1"]["alpha"], dt)
        h = ex.conv(h, f"stem_{i}_c2", blk["conv2"], PAD1)
        h = instance_norm_nhwc(h).astype(dt)
        y = y + h

    b = ex.conv(y, "bottleneck", p["bottleneck_conv"], PAD1)
    b = instance_norm_nhwc(b).astype(dt)
    return b + r


def _stage_conv(p, ex, x, name, leaf, mask=None):
    """One upsample-stage conv at LR: conv + bias [+ pad re-zero] + PReLU
    (pre-shuffle). Mask semantics follow ops/lr_tail.py: re-zero after the
    bias (padding must stay exactly zero — PReLU keeps zeros zero)."""
    dt = ex.glue
    a = ex.conv(x, name, leaf["conv"], PAD1)
    a = a + leaf["conv"]["bias"].astype(dt)
    if mask is not None:
        a = a * mask
    return _prelu(a, leaf["relu"]["alpha"], dt)


def _tail_4x(p, ex, y, up0="upsampling_0", up1="upsampling_1",
             n0="up0", n1="up1", mask=None):
    """The 4x LR-domain tail (ops/lr_tail.py transform), executor-driven.

    ``mask`` enables the exact zero-pad-masked path (one LR mask serves
    every stage — the whole tail stays at LR; masked zeros quantize to
    int8 zero exactly, so the int8 convs see the same zeros the unpadded
    program's conv padding provides).

    Head forms: when the head is FLOAT (the production ups-only mode) and
    no calibration is collecting, the 16F phase concat is never
    materialized — the head kernel's input channels are phase-major and
    the stage-2 PReLU slope is a single shared scalar, so
    ``conv(prelu(concat(phases)), Kd) == sum_p conv(prelu(phase_p), Kd_p)``
    with fp32 partial accumulation. The concat tensor (13.2 GB at batch
    112 x 180x320) is the program's HBM watermark; the summed form lifts
    the v5e batch cap 120 -> 128 and measured 657.6 fps vs 579.8
    (scripts/phase_summed_head_experiment.py, docs/DESIGN.md "int8
    decision record"). Calibration keeps the concat (per-conv-input stats
    are defined on the full head input), as do int8-head modes."""
    dt = ex.glue
    if mask is not None:
        mask = mask.astype(dt)
    a1 = _stage_conv(p, ex, y, n0, p[up0], mask=mask)  # [B,H,W,4F]

    # Stage 2: four per-phase conv2x2s sharing one input quantization.
    leaf = p[up1]["conv"]
    if "qkernel" in leaf:
        a1q = ex.qin(n1, a1)
        phases = [
            ex.conv_q(a1q, n1, kp, leaf["wscale"], ((1 - pp, pp), (1 - q, q)))
            for (pp, q), kp in _phase_kernels_2x(leaf["qkernel"]).items()
        ]
    else:
        ex.observe(n1, a1)
        phases = [
            lax.conv_general_dilated(
                a1, kp, (1, 1),
                ((1 - pp, pp), (1 - q, q)), dimension_numbers=_DN,
            ).astype(dt)
            for (pp, q), kp in _phase_kernels_2x(
                leaf["kernel"].astype(dt)
            ).items()
        ]
    b2 = leaf["bias"].astype(dt)
    head = p["head_conv"]
    alpha2 = p[up1]["relu"]["alpha"]

    if "kernel" in head and ex.collect is None:
        # Phase-summed float head (see docstring above).
        kd = _head_kernel_4x(head["kernel"]).astype(dt)
        f4 = a1.shape[-1]
        z = None
        for i, ph in enumerate(phases):
            ph = ph + b2
            if mask is not None:
                ph = ph * mask
            ph = _prelu(ph, alpha2, dt)
            part = lax.conv_general_dilated(
                ph, kd[:, :, i * f4 : (i + 1) * f4, :], (1, 1), PAD1,
                dimension_numbers=_DN,
                preferred_element_type=jnp.float32,
            )
            z = part if z is None else z + part
    else:
        a2 = jnp.concatenate([ph + b2 for ph in phases], axis=-1)
        if mask is not None:
            a2 = a2 * mask
        a2 = _prelu(a2, alpha2, dt)
        z = ex.conv(
            a2, "head", head, PAD1,
            kernel_tf=_head_kernel_4x,
            wscale_tf=lambda ws: jnp.repeat(ws, 16),
        ).astype(jnp.float32)
    z = z + jnp.repeat(head["bias"], 16).astype(jnp.float32)
    z = jnp.tanh(z)
    return pixel_shuffle_nhwc(z, 4)


def _tail_2x(p, ex, y, mask=None):
    dt = ex.glue
    if mask is not None:
        mask = mask.astype(dt)
    a1 = _stage_conv(p, ex, y, "up0", p["upsampling_0"], mask=mask)
    z = ex.conv(
        a1, "head", p["head_conv"], PAD1,
        kernel_tf=_head_kernel_2x,
        wscale_tf=lambda ws: jnp.repeat(ws, 4),
    )
    z = z + jnp.repeat(p["head_conv"]["bias"], 4).astype(dt)
    z = jnp.tanh(z.astype(jnp.float32))
    return pixel_shuffle_nhwc(z, 2)


def _tail_8x(p, ex, y, mask=None):
    """Hierarchical (ops/lr_tail.py lr_tail_8x): stage 0 canonical to 2x,
    then the 4x transform at 2x resolution with stage names shifted.
    Masked: re-zero after stage-0 bias, then the 2x mask is the LR mask
    with each pixel repeated 2x2 (ops/lr_tail.py lr_tail_8x docstring)."""
    dt = ex.glue
    a0 = ex.conv(y, "up0", p["upsampling_0"]["conv"], PAD1)
    a0 = a0 + p["upsampling_0"]["conv"]["bias"].astype(dt)
    if mask is not None:
        a0 = a0 * mask.astype(dt)
    a0 = pixel_shuffle_nhwc(a0, 2)
    y2 = _prelu(a0, p["upsampling_0"]["relu"]["alpha"], dt)
    mask2 = None
    if mask is not None:
        mask2 = jnp.repeat(jnp.repeat(mask, 2, axis=1), 2, axis=2)
    return _tail_4x(
        p, ex, y2, up0="upsampling_1", up1="upsampling_2",
        n0="up1", n1="up2", mask=mask2,
    )


def _forward(p, ex, x, scale_factor):
    y = _trunk(p, ex, x)
    tail = {2: _tail_2x, 4: _tail_4x, 8: _tail_8x}.get(scale_factor)
    if tail is None:
        raise ValueError(f"scale_factor must be 2, 4, or 8: {scale_factor}")
    return tail(p, ex, y)


# -- public entry points ------------------------------------------------------


def sr_float_forward(
    params: Dict[str, Any],
    x: jnp.ndarray,
    scale_factor: int = 4,
    collect: Dict[str, jnp.ndarray] | None = None,
    collect_q: float | None = None,
) -> jnp.ndarray:
    """Float forward of the quantized-tier topology (fp32 glue).

    Numerically the canonical ``Generator.apply`` + LR-domain tail
    (tests/test_quant.py asserts this); ``collect`` (a mutable dict)
    receives per-conv-input max-abs — the calibration instrument —
    or the ``collect_q``-th percentile of |x| when given (percentile
    calibration clips activation outliers for finer int8 resolution).
    """
    p = params["params"] if "params" in params else params
    ex = _Exec(
        scales=None, collect=collect, glue_dtype=jnp.float32,
        collect_q=collect_q,
    )
    return _forward(p, ex, x.astype(jnp.float32), scale_factor)


def sr_quant_forward(
    qparams: Dict[str, Any],
    act_scales: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    scale_factor: int = 4,
    glue_dtype: Any = jnp.bfloat16,
) -> jnp.ndarray:
    """Int8 forward: x float [-1,1] NHWC -> float [-1,1] NHWC (4x/2x/8x).

    ``qparams`` from :func:`quantize_generator_params`; ``act_scales`` from
    :func:`calibrate_scales` (per-tensor max-abs, jit inputs so
    recalibration never recompiles).
    """
    ex = _Exec(scales=act_scales, collect=None, glue_dtype=glue_dtype)
    return _forward(qparams, ex, x.astype(glue_dtype), scale_factor)


def default_calibration_batch(
    h: int = 180, w: int = 320, n: int = 4, seed: int = 0
) -> jnp.ndarray:
    """Synthetic natural-image-statistics calibration batch ([-1,1] NHWC).

    Used when the caller has no sample inputs (e.g. a video stream about to
    start). Mixes the activation drivers real content has — smooth
    gradients, hard edges, and texture noise — so per-conv max-abs scales
    land near those from natural images; the input itself is bounded in
    [-1,1] like every real input, so the first conv's scale is exact either
    way. Calibrating on actual inputs (``SRInferenceEngine.recalibrate`` /
    ``infer.py --int8`` does this automatically) is still preferred.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    imgs = []
    for i in range(n):
        grad = np.sin(yy / (8 + 13 * i) + i) * np.cos(xx / (11 + 7 * i))
        edges = np.sign(np.sin(yy / (3 + 2 * i)) * np.sin(xx / (5 + 3 * i)))
        noise = rng.standard_normal((h, w)).astype(np.float32)
        base = 0.55 * grad + 0.3 * edges + 0.15 * noise
        chans = [
            np.clip(base + 0.1 * rng.standard_normal((h, w)), -1, 1)
            for _ in range(3)
        ]
        imgs.append(np.stack(chans, -1).astype(np.float32))
    return jnp.asarray(np.stack(imgs))


def calibration_batch_from_images(
    images: Iterable[Any], k: int = 8, max_h: int = 180, max_w: int = 320
) -> jnp.ndarray | None:
    """Build ONE calibration batch from sample uint8 HWC images.

    Center-crops up to ``k`` images to a single common shape (the smallest
    of the selected images, capped at max_h x max_w) so calibration costs
    exactly one compile, and maps to [-1,1]. Images smaller than 32x32 or
    with fewer than 3 channels are skipped (RGBA is accepted and sliced to
    RGB); returns None if nothing usable remains (callers fall back to
    :func:`default_calibration_batch`).
    """
    import numpy as np

    picked = []
    for im in images:
        im = np.asarray(im)
        if im.ndim != 3 or im.shape[0] < 32 or im.shape[1] < 32:
            continue
        if im.shape[2] < 3:  # grayscale/2-channel: [..., :3] below would
            continue  # yield ragged channel dims and crash np.stack
        picked.append(im)
        if len(picked) == k:
            break
    if not picked:
        return None
    ch = min(max_h, min(im.shape[0] for im in picked))
    cw = min(max_w, min(im.shape[1] for im in picked))
    crops = []
    for im in picked:
        y0 = (im.shape[0] - ch) // 2
        x0 = (im.shape[1] - cw) // 2
        crop = im[y0 : y0 + ch, x0 : x0 + cw, :3].astype(np.float32)
        crops.append(crop / 127.5 - 1.0)
    return jnp.asarray(np.stack(crops))


def sr_quant_forward_masked(
    model,
    qparams: Dict[str, Any],
    act_scales: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    valid_hw,
    glue_dtype: Any = jnp.bfloat16,
) -> jnp.ndarray:
    """Masked (bucketed-exact) int8 forward for TAIL-ONLY quantized trees.

    The trunk runs the canonical masked float forward (Generator
    ``valid_hw`` semantics: per-sample valid-region instance-norm
    statistics + pad re-zeroing — the hard part of masking, and exactly
    why the masked tier requires the trunk unquantized), then the int8
    LR-domain tail applies the same pad re-zeroing as ops/lr_tail.py's
    masked path. Masked zeros quantize to int8 zero exactly (symmetric
    scheme), so each valid output pixel equals the unpadded int8
    program's up to float reassociation.

    Args:
      model: the Generator (provides trunk apply + scale_factor).
      qparams: tree from ``quantize_generator_params(params,
        only=is_tail_module)`` — raises if a trunk conv is quantized.
      valid_hw: (valid_h, valid_w) int32 [B] arrays, as Generator takes.
    """
    p = qparams["params"] if "params" in qparams else qparams
    if "qkernel" in p["neck_conv"]:
        raise ValueError(
            "masked int8 requires a float trunk: quantize with "
            "only=is_tail_module (the per-sample masked instance-norm "
            "statistics are float-path only)"
        )
    y = model.apply({"params": p}, x, trunk_only=True, valid_hw=valid_hw)
    from fast_srgan_tpu.ops.norm import valid_mask_nhwc

    mask, _ = valid_mask_nhwc(
        y.shape[1], y.shape[2], valid_hw[0], valid_hw[1]
    )
    ex = _Exec(scales=act_scales, collect=None, glue_dtype=glue_dtype)
    tail = {2: _tail_2x, 4: _tail_4x, 8: _tail_8x}.get(model.scale_factor)
    if tail is None:
        raise ValueError(
            f"scale_factor must be 2, 4, or 8: {model.scale_factor}"
        )
    return tail(p, ex, y.astype(glue_dtype), mask=mask)


DEFAULT_PERCENTILE = 99.99
"""Production activation-calibration percentile (measured optimum).

Clipping the top 0.01% of |activation| buys finer int8 resolution for
everything below the clip: on the pretrained weights the ups-only arm
measures 41.9 dB vs fp32 (calibration-set), 41.4-41.7 dB on held-out
synthetic AND noise inputs, against max-abs' 39.3-39.7 — a +1.8-2.4 dB
generalizing win; 99.9 and below over-clip (38.7 at 99.9, 33.4 at 99.5).
Sweep: scripts/eval_int8.py --psnr_percentiles; record in docs/DESIGN.md
"int8 decision record"."""


def calibrate_scales(
    params: Dict[str, Any],
    batches: Iterable[Any],
    scale_factor: int = 4,
    margin: float = 1.0,
    percentile: float | None = DEFAULT_PERCENTILE,
) -> Dict[str, jnp.ndarray]:
    """Run the float forward over calibration batches ([-1,1] NHWC float or
    uint8 HWC/NHWC) and return per-conv-input activation scales (the
    ``percentile``-th percentile of |x|, times ``margin``). One jit per
    distinct batch shape.

    ``percentile`` defaults to :data:`DEFAULT_PERCENTILE` (99.99, the
    measured optimum — see its docstring); ``None`` selects plain max-abs
    (no outlier clipping)."""

    @jax.jit
    def stats(p, xb):
        c: Dict[str, jnp.ndarray] = {}
        sr_float_forward(p, xb, scale_factor, collect=c, collect_q=percentile)
        return c

    agg: Dict[str, jnp.ndarray] = {}
    n = 0
    for b in batches:
        b = jnp.asarray(b)
        if b.dtype == jnp.uint8:
            b = b.astype(jnp.float32) / 127.5 - 1.0
        if b.ndim == 3:
            b = b[None]
        for k, v in stats(params, b).items():
            agg[k] = v if k not in agg else jnp.maximum(agg[k], v)
        n += 1
    if n == 0:
        raise ValueError("calibrate_scales needs at least one batch")
    return {
        k: jnp.maximum(v.astype(jnp.float32) * margin, 1e-6)
        for k, v in agg.items()
    }
