"""Spatially-sharded generator inference: halo exchange + distributed norm.

Large frames (e.g. 4K output = 540x960 LR input) can exceed single-chip
appetite and, more importantly, want multi-chip latency scaling. The image-
domain analogue of sequence parallelism (SURVEY.md §2.7/§5) is to shard the
frame's width across the mesh and keep the computation EXACT:

  * every 3x3 conv needs one pixel column from each neighbor -> a
    `lax.ppermute` halo exchange per conv (tiny [B, H, 1, C] messages riding
    ICI), with zero-padding at the global frame edges to match the
    single-device conv's `padding=1` semantics;
  * instance norm is global over the frame, NOT local to the shard (the
    bucketing experiment in inference.py showed per-shard stats corrupt
    every pixel) -> local sum/sumsq are `lax.psum`'d across the axis so all
    shards normalize with the global statistics;
  * pixel shuffle, PReLU, tanh are pointwise/local-in-width -> unchanged;
  * the upsampling tail runs in the LR domain by default (ops/lr_tail.py
    ported to sharded form, `_sharded_lr_tail`): the 2x/4x-resolution
    tiles — the largest tensors of a 4K frame — are never materialized on
    any shard, and the per-phase conv2x2s reuse the same one-column halos.

The forward here is a pure-functional twin of models/generator.py operating
on the same param pytree, with pluggable conv/norm so the identical code
path runs (a) single-device [parity oracle] and (b) under `shard_map`
[production]. Parity is enforced by tests on the 8-device CPU mesh.

Reference behavior being scaled: fully-convolutional native-resolution
inference (reference inference.py:48-53 runs batch-1 full frames on one
device; 2160p there means seconds per frame on host memory).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fast_srgan_tpu.ops.norm import instance_norm_nhwc
from fast_srgan_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc


# ---------------------------------------------------------------------------
# Functional generator core (shared by local and sharded paths)
# ---------------------------------------------------------------------------

def _n_stem(p: Dict[str, Any]) -> int:
    return len([k for k in p if k.startswith("stem_")])


def _prelu(t, alpha):
    a = alpha.astype(t.dtype)
    return jnp.where(t >= 0, t, a * t)


def generator_forward(
    p: Dict[str, Any],
    x: jnp.ndarray,
    conv: Callable,
    norm: Callable,
    dtype: Any = jnp.float32,
    tail: Callable | None = None,
) -> jnp.ndarray:
    """The reference generator graph (model.py:112-117) over pluggable ops.

    `p` is the inner dict of the Flax param tree (params['params']).
    `conv(x, node)` applies a 3x3 stride-1 conv from a {'kernel', 'bias'?}
    node; `norm(x)` is parameterless instance normalization. `tail(p, y)`
    replaces the canonical conv->shuffle upsampling tail when given (the
    LR-domain tail below).
    """
    x = x.astype(dtype)
    r = _prelu(conv(x, p["neck_conv"]), p["neck_relu"]["alpha"])
    y = r
    for i in range(_n_stem(p)):
        blk = p[f"stem_{i}"]
        t = _prelu(norm(conv(y, blk["conv1"])), blk["relu1"]["alpha"])
        y = norm(conv(t, blk["conv2"])) + y
    y = norm(conv(y, p["bottleneck_conv"])) + r
    if tail is not None:
        return tail(p, y)
    n_up = len([k for k in p if k.startswith("upsampling_")])
    for j in range(n_up):
        blk = p[f"upsampling_{j}"]
        y = _prelu(pixel_shuffle_nhwc(conv(y, blk["conv"]), 2), blk["relu"]["alpha"])
    return jnp.tanh(conv(y, p["head_conv"]).astype(jnp.float32))


def _local_conv(x: jnp.ndarray, node: Dict[str, Any]) -> jnp.ndarray:
    kernel = node["kernel"].astype(x.dtype)
    pad = ((kernel.shape[0] - 1) // 2, (kernel.shape[0] - 1) // 2)
    y = lax.conv_general_dilated(
        x, kernel, (1, 1), padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in node:
        y = y + node["bias"].astype(x.dtype)
    return y


def generator_forward_local(p, x, dtype=jnp.float32):
    """Single-device functional forward — parity oracle for the Flax module."""
    return generator_forward(
        p, x, conv=_local_conv, norm=instance_norm_nhwc, dtype=dtype
    )


# ---------------------------------------------------------------------------
# Sharded ops (inside shard_map over a 1-D spatial axis)
# ---------------------------------------------------------------------------

def _halo_conv(axis_name: str):
    """3x3 stride-1 conv with a 1-column halo exchange along sharded W."""

    def conv(x: jnp.ndarray, node: Dict[str, Any]) -> jnp.ndarray:
        # Frame edges use zero padding (torch Conv2d padding=1).
        from_left, from_right = _exchange_halo_cols(x, axis_name)
        xx = jnp.concatenate([from_left, x, from_right], axis=2)
        kernel = node["kernel"].astype(x.dtype)
        y = lax.conv_general_dilated(
            xx, kernel, (1, 1), padding=((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if "bias" in node:
            y = y + node["bias"].astype(x.dtype)
        return y

    return conv


def _exchange_halo_cols(x: jnp.ndarray, axis_name: str):
    """One column each way along the sharded W axis; zeros at frame edges."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    from_left = lax.ppermute(
        x[:, :, -1:, :], axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_right = lax.ppermute(
        x[:, :, :1, :], axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right), from_right)
    return from_left, from_right


def _sharded_lr_tail(axis_name: str, dtype: Any):
    """The LR-domain tail (ops/lr_tail.py) under width sharding.

    The whole tail runs at LR resolution, so the 2x/4x-resolution tiles —
    the largest tensors of a 4K frame — are never materialized on any shard.
    The per-phase conv2x2s need a one-column halo on one side only (phase q
    reads LR columns {w+q-1, w+q}); the zeroed frame-edge halo reproduces
    exactly the asymmetric ((1-q), q) zero padding of the single-device
    transform. The dense 16-phase head conv3x3 reuses the standard halo.
    """
    from fast_srgan_tpu.ops.lr_tail import (
        _head_kernel_4x,
        _phase_kernels_2x,
    )

    conv3 = _halo_conv(axis_name)

    def tail(p: Dict[str, Any], y: jnp.ndarray) -> jnp.ndarray:
        up0, up1 = p["upsampling_0"], p["upsampling_1"]

        y = y.astype(dtype)
        a1 = _prelu(conv3(y, up0["conv"]), up0["relu"]["alpha"])

        fl, fr = _exchange_halo_cols(a1, axis_name)
        xx = jnp.concatenate([fl, a1, fr], axis=2)  # [B, H, W+2, 4F]
        w = a1.shape[2]
        b2 = up1["conv"]["bias"].astype(a1.dtype)
        phases = []
        for (pp, q), kp in _phase_kernels_2x(up1["conv"]["kernel"]).items():
            z = lax.conv_general_dilated(
                xx[:, :, q : q + w + 1, :], kp.astype(a1.dtype), (1, 1),
                padding=((1 - pp, pp), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            phases.append(z + b2)
        a2 = _prelu(
            jnp.concatenate(phases, axis=-1), up1["relu"]["alpha"]
        )  # [B, H, W, 16F]

        kd = _head_kernel_4x(p["head_conv"]["kernel"])
        b48 = jnp.repeat(p["head_conv"]["bias"], 16)
        z = conv3(a2, {"kernel": kd, "bias": b48})
        return pixel_shuffle_nhwc(jnp.tanh(z.astype(jnp.float32)), 4)

    return tail


def _sharded_lr_tail_2x(axis_name: str, dtype: Any):
    """scale_factor=2 analogue of :func:`_sharded_lr_tail`: the single
    stage conv runs at LR verbatim and the 4-phase dense head
    (ops/lr_tail._head_kernel_2x) reuses the standard one-column halo."""
    from fast_srgan_tpu.ops.lr_tail import _head_kernel_2x

    conv3 = _halo_conv(axis_name)

    def tail(p: Dict[str, Any], y: jnp.ndarray) -> jnp.ndarray:
        up0 = p["upsampling_0"]
        y = y.astype(dtype)
        a1 = _prelu(conv3(y, up0["conv"]), up0["relu"]["alpha"])
        kd = _head_kernel_2x(p["head_conv"]["kernel"])
        b12 = jnp.repeat(p["head_conv"]["bias"], 4)
        z = conv3(a1, {"kernel": kd, "bias": b12})
        return pixel_shuffle_nhwc(jnp.tanh(z.astype(jnp.float32)), 2)

    return tail


def _sharded_lr_tail_8x(axis_name: str, dtype: Any):
    """scale_factor=8, hierarchical (ops/lr_tail.lr_tail_8x under width
    sharding): stage 0 runs canonically per shard (pixel shuffle is
    width-local — shard column i emits global columns 2i, 2i+1 inside the
    same shard, so the width partition stays contiguous), then the 4x
    transform runs at 2x resolution over the shifted param subtree."""
    conv3 = _halo_conv(axis_name)
    tail4 = _sharded_lr_tail(axis_name, dtype)

    def tail(p: Dict[str, Any], y: jnp.ndarray) -> jnp.ndarray:
        up0 = p["upsampling_0"]
        y = y.astype(dtype)
        a0 = pixel_shuffle_nhwc(conv3(y, up0["conv"]), 2)
        y2 = _prelu(a0, up0["relu"]["alpha"])  # [B, 2H, 2W/n, F]
        sub = {
            "upsampling_0": p["upsampling_1"],
            "upsampling_1": p["upsampling_2"],
            "head_conv": p["head_conv"],
        }
        return tail4(sub, y2)

    return tail


def _dist_instance_norm(axis_name: str, eps: float = 1e-5):
    """Instance norm with statistics psum'd across the spatial shards."""

    def norm(x: jnp.ndarray) -> jnp.ndarray:
        x32 = x.astype(jnp.float32)
        local_n = x.shape[1] * x.shape[2]
        s = lax.psum(jnp.sum(x32, axis=(1, 2), keepdims=True), axis_name)
        ss = lax.psum(jnp.sum(x32 * x32, axis=(1, 2), keepdims=True), axis_name)
        count = local_n * lax.axis_size(axis_name)
        mean = s / count
        # biased variance (torch InstanceNorm); clamped because the
        # E[x^2]-E[x]^2 form can cancel below zero in fp32 -> rsqrt NaN
        var = jnp.maximum(ss / count - mean * mean, 0.0)
        y = (x32 - mean) * lax.rsqrt(var + eps)
        return y.astype(x.dtype)

    return norm


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _resolve_mesh_axes(mesh: Mesh, axis_name: str):
    """(spatial_axis, batch_axis|None) for a 1-D sp or 2-D batch+sp mesh."""
    if axis_name in mesh.axis_names:
        mesh_axis = axis_name
    elif len(mesh.axis_names) == 1:
        (mesh_axis,) = mesh.axis_names
    else:
        raise ValueError(
            f"mesh axes {mesh.axis_names} contain no spatial axis "
            f"{axis_name!r}"
        )
    batch_axes = tuple(a for a in mesh.axis_names if a != mesh_axis)
    if len(batch_axes) > 1:
        raise ValueError(
            f"expected at most one batch axis besides {mesh_axis!r}, got "
            f"{mesh.axis_names}"
        )
    return mesh_axis, (batch_axes[0] if batch_axes else None)


@functools.lru_cache(maxsize=8)
def build_tiled_forward(
    mesh: Mesh,
    axis_name: str = "sp",
    dtype: Any = jnp.bfloat16,
    lr_tail: bool = True,
):
    """Jitted exact spatially-tiled generator forward over `mesh`.

    Returns fn(params, x) with x [B, H, W, 3] in [-1, 1]; W must be
    divisible by the spatial axis size (exactness requires no padding —
    instance norm is global). With ``lr_tail`` (default; 2x/4x/8x — the
    full-LR, two-stage and hierarchical variants respectively) the
    upsampling tail runs at reduced resolution per shard (see
    _sharded_lr_tail*); exactness is unchanged.

    `mesh` is either 1-D (every device holds a width slice of every frame)
    or 2-D with a batch axis plus `axis_name` (e.g. ``("data", "sp")``):
    the batch is sharded over the data axis while each frame's width is
    sharded over the sp axis — batched multi-frame 4K serving where the
    halo/psum collectives stay within each sp group. B must then divide
    the data axis size.
    """
    mesh_axis, batch_axis = _resolve_mesh_axes(mesh, axis_name)
    sp_size = mesh.shape[mesh_axis]

    tail_builders = {
        1: _sharded_lr_tail_2x, 2: _sharded_lr_tail, 3: _sharded_lr_tail_8x
    }

    def sharded(p, x):
        n_up = len([k for k in p if k.startswith("upsampling_")])
        builder = tail_builders.get(n_up) if lr_tail else None
        return generator_forward(
            p, x,
            conv=_halo_conv(mesh_axis),
            norm=_dist_instance_norm(mesh_axis),
            dtype=dtype,
            tail=builder(mesh_axis, dtype) if builder else None,
        )

    mapped = jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P(batch_axis, None, mesh_axis, None)),
        out_specs=P(batch_axis, None, mesh_axis, None),
    )

    @jax.jit
    def forward(params, x):
        p = params["params"] if "params" in params else params
        if x.shape[2] % sp_size != 0:
            raise ValueError(
                f"width {x.shape[2]} not divisible by spatial axis size "
                f"{sp_size}"
            )
        if batch_axis is not None and x.shape[0] % mesh.shape[batch_axis]:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by {batch_axis!r} axis "
                f"size {mesh.shape[batch_axis]}"
            )
        return mapped(p, x)

    return forward


def tiled_upscale_u8(params, frame_u8: np.ndarray, mesh: Mesh, dtype=jnp.bfloat16):
    """Convenience: uint8 HWC frame -> uint8 upscaled frame, tiled across
    `mesh`. Single-frame by design, so the mesh must be 1-D (every device
    holds a width slice); for batched frames over a 2-D ("data", "sp")
    mesh use :func:`build_tiled_forward` directly."""
    if len(mesh.axis_names) != 1:
        raise ValueError(
            f"tiled_upscale_u8 shards ONE frame and needs a 1-D mesh, got "
            f"axes {mesh.axis_names}; use build_tiled_forward for batched "
            "2-D ('data','sp') meshes"
        )
    forward = build_tiled_forward(mesh, dtype=dtype)
    x = jnp.asarray(frame_u8[None]).astype(jnp.float32) / 127.5 - 1.0
    x = jax.device_put(x, NamedSharding(mesh, P(None, None, mesh.axis_names[0], None)))
    y = forward(params, x)
    out = ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)
    return np.asarray(out[0])


def tiled_quant_upscale_u8(
    qparams,
    act_scales,
    frame_u8: np.ndarray,
    mesh: Mesh,
    glue_dtype=jnp.bfloat16,
    scale_factor: int = 4,
):
    """Convenience: uint8 HWC frame -> uint8 upscaled frame through the
    int8 PTQ tier (:func:`build_tiled_quant_forward`), width-tiled across
    `mesh`. The int8 counterpart of :func:`tiled_upscale_u8` — same 1-D
    mesh contract; ``qparams``/``act_scales`` as documented on
    :func:`build_tiled_quant_forward`. This is infer.py's
    ``--int8 --tile`` path (the reference runs full frames single-device,
    /root/reference/inference.py:48-53)."""
    if len(mesh.axis_names) != 1:
        raise ValueError(
            f"tiled_quant_upscale_u8 shards ONE frame and needs a 1-D mesh, "
            f"got axes {mesh.axis_names}; use build_tiled_quant_forward for "
            "batched 2-D ('data','sp') meshes"
        )
    forward = build_tiled_quant_forward(
        mesh, glue_dtype=glue_dtype, scale_factor=scale_factor
    )
    x = jnp.asarray(frame_u8[None]).astype(jnp.float32) / 127.5 - 1.0
    x = jax.device_put(x, NamedSharding(mesh, P(None, None, mesh.axis_names[0], None)))
    y = forward(qparams, act_scales, x)
    out = ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)
    return np.asarray(out[0])


# ---------------------------------------------------------------------------
# Spatially-sharded int8 forward — the PTQ tier under width tiling
# ---------------------------------------------------------------------------
#
# Why this matches quant.sr_quant_forward (not an approximation): the
# int8 tier's activation scales are STATIC (calibrated constants,
# quant.calibrate_scales), so per-shard quantization commutes with the
# halo concatenation — quantize(concat(halo, x)) ==
# concat(quantize(halo), quantize(x)) elementwise — and the frame-edge
# zero halos quantize to int8 zero exactly (symmetric scheme), matching
# the unsharded conv's zero padding. Instance-norm statistics are psum'd
# (global over the frame) exactly as in the float tiled forward. The
# sharded program therefore computes the same int8 contractions over the
# same values, with ONE caveat: the float trunk/glue feeding each
# quantizer differs from the unsharded program by fp32 reduction order
# (~1e-6 — conv blocking and psum association differ across shardings;
# the float tiled forward carries the same spread). When such a
# difference lands an activation exactly on a round() boundary, that
# value quantizes one int8 level apart, and the flip amplifies to at
# most a ~one-quantization-step band downstream (measured: <=2 uint8
# output counts at ~1% of pixels in the rare inputs where it happens at
# all; 0 pixels on typical fixtures — tests/test_spatial_quant.py
# asserts 3e-7 there, __graft_entry__'s gate asserts the bounded-flip
# contract). Bitwise sharding-invariance would require bitwise-identical
# conv reductions across shapes, which no backend guarantees.


def _halo_exec_conv(ex, axis_name, x, name, leaf, kernel_tf=None,
                    wscale_tf=None):
    """One quant._Exec conv (float or int8 by leaf form) with a one-column
    halo along the sharded W axis. Halos are exchanged in the glue/float
    domain; the executor quantizes the concatenated tensor (exact — see
    the section comment above)."""
    fl, fr = _exchange_halo_cols(x, axis_name)
    xx = jnp.concatenate([fl, x, fr], axis=2)
    return ex.conv(xx, name, leaf, ((1, 1), (0, 0)), kernel_tf, wscale_tf)


def _sharded_q_trunk(p, ex, x, axis_name):
    """quant._trunk with halo convs and psum'd instance-norm statistics."""
    dt = ex.glue
    norm = _dist_instance_norm(axis_name)
    r = _halo_exec_conv(ex, axis_name, x, "neck", p["neck_conv"])
    r = r + p["neck_conv"]["bias"].astype(dt)
    r = _prelu(r, p["neck_relu"]["alpha"])
    y = r
    for i in range(_n_stem(p)):
        blk = p[f"stem_{i}"]
        h = _halo_exec_conv(ex, axis_name, y, f"stem_{i}_c1", blk["conv1"])
        h = norm(h).astype(dt)
        h = _prelu(h, blk["relu1"]["alpha"])
        h = _halo_exec_conv(ex, axis_name, h, f"stem_{i}_c2", blk["conv2"])
        h = norm(h).astype(dt)
        y = y + h
    b = _halo_exec_conv(ex, axis_name, y, "bottleneck", p["bottleneck_conv"])
    b = norm(b).astype(dt)
    return b + r


def _sharded_q_tail_4x(p, ex, y, axis_name, up0="upsampling_0",
                       up1="upsampling_1", n0="up0", n1="up1"):
    """quant._tail_4x under width sharding: int8 (or float) stage convs
    with halo exchange, phase-summed float head (or int8 concat head —
    per-leaf dispatch, same as the unsharded executor)."""
    from fast_srgan_tpu.ops.lr_tail import _head_kernel_4x, _phase_kernels_2x

    dt = ex.glue
    a = _halo_exec_conv(ex, axis_name, y, n0, p[up0]["conv"])
    a = a + p[up0]["conv"]["bias"].astype(dt)
    a1 = _prelu(a, p[up0]["relu"]["alpha"])

    # Stage 2: per-phase conv2x2s share ONE input quantization of the
    # halo-extended tensor; phase q reads columns {w+q-1, w+q}, exactly
    # the float _sharded_lr_tail's slicing.
    leaf = p[up1]["conv"]
    fl, fr = _exchange_halo_cols(a1, axis_name)
    xx = jnp.concatenate([fl, a1, fr], axis=2)  # [B, H, w+2, 4F]
    w = a1.shape[2]
    if "qkernel" in leaf:
        xxq = ex.qin(n1, xx)
        phases = [
            ex.conv_q(
                xxq[:, :, q : q + w + 1, :], n1, kp, leaf["wscale"],
                ((1 - pp, pp), (0, 0)),
            )
            for (pp, q), kp in _phase_kernels_2x(leaf["qkernel"]).items()
        ]
    else:
        phases = [
            lax.conv_general_dilated(
                xx[:, :, q : q + w + 1, :], kp, (1, 1),
                ((1 - pp, pp), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(dt)
            for (pp, q), kp in _phase_kernels_2x(
                leaf["kernel"].astype(dt)
            ).items()
        ]
    b2 = leaf["bias"].astype(dt)
    head = p["head_conv"]
    alpha2 = p[up1]["relu"]["alpha"]

    if "kernel" in head:
        # Phase-summed float head (quant._tail_4x docstring): one 3x3
        # halo conv per phase with the phase-major kernel slice, fp32
        # partial accumulation.
        kd = _head_kernel_4x(head["kernel"]).astype(dt)
        f4 = a1.shape[-1]
        z = None
        for i, ph in enumerate(phases):
            ph = _prelu(ph + b2, alpha2)
            pfl, pfr = _exchange_halo_cols(ph, axis_name)
            pxx = jnp.concatenate([pfl, ph, pfr], axis=2)
            part = lax.conv_general_dilated(
                pxx, kd[:, :, i * f4 : (i + 1) * f4, :], (1, 1),
                ((1, 1), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            z = part if z is None else z + part
    else:
        a2 = _prelu(
            jnp.concatenate([ph + b2 for ph in phases], axis=-1), alpha2
        )
        z = _halo_exec_conv(
            ex, axis_name, a2, "head", head,
            kernel_tf=_head_kernel_4x,
            wscale_tf=lambda ws: jnp.repeat(ws, 16),
        ).astype(jnp.float32)
    z = z + jnp.repeat(head["bias"], 16).astype(jnp.float32)
    return pixel_shuffle_nhwc(jnp.tanh(z), 4)


def _sharded_q_tail_2x(p, ex, y, axis_name):
    from fast_srgan_tpu.ops.lr_tail import _head_kernel_2x

    dt = ex.glue
    a = _halo_exec_conv(ex, axis_name, y, "up0", p["upsampling_0"]["conv"])
    a = a + p["upsampling_0"]["conv"]["bias"].astype(dt)
    a1 = _prelu(a, p["upsampling_0"]["relu"]["alpha"])
    z = _halo_exec_conv(
        ex, axis_name, a1, "head", p["head_conv"],
        kernel_tf=_head_kernel_2x,
        wscale_tf=lambda ws: jnp.repeat(ws, 4),
    )
    z = z + jnp.repeat(p["head_conv"]["bias"], 4).astype(dt)
    return pixel_shuffle_nhwc(jnp.tanh(z.astype(jnp.float32)), 2)


def _sharded_q_tail_8x(p, ex, y, axis_name):
    """Hierarchical (quant._tail_8x): stage 0 canonically to 2x — pixel
    shuffle is width-local, so the partition stays contiguous — then the
    4x tail at 2x resolution over the shifted param subtree."""
    dt = ex.glue
    a0 = _halo_exec_conv(ex, axis_name, y, "up0", p["upsampling_0"]["conv"])
    a0 = a0 + p["upsampling_0"]["conv"]["bias"].astype(dt)
    a0 = pixel_shuffle_nhwc(a0, 2)
    y2 = _prelu(a0, p["upsampling_0"]["relu"]["alpha"])
    return _sharded_q_tail_4x(
        p, ex, y2, axis_name,
        up0="upsampling_1", up1="upsampling_2", n0="up1", n1="up2",
    )


@functools.lru_cache(maxsize=8)
def build_tiled_quant_forward(
    mesh: Mesh,
    axis_name: str = "sp",
    glue_dtype: Any = jnp.bfloat16,
    scale_factor: int = 4,
):
    """Jitted exact spatially-tiled int8 (PTQ-tier) forward over `mesh`.

    Returns ``fn(qparams, act_scales, x)``: ``qparams`` from
    :func:`fast_srgan_tpu.quant.quantize_generator_params` (any arm —
    the production ups-only, tail, full, or an unquantized float tree;
    per-leaf dispatch exactly as in ``quant.sr_quant_forward``),
    ``act_scales`` from ``quant.calibrate_scales`` (replicated jit
    inputs, so recalibration never recompiles), ``x`` [B, H, W, 3] in
    [-1, 1] with W divisible by the spatial axis size. Mesh semantics
    match :func:`build_tiled_forward` (1-D sp, or 2-D batch axis + sp).

    This composes the two scaling tiers: the int8 production policy
    (docs/DESIGN.md "int8 decision record") and exact multi-chip spatial
    tiling (the long-context analogue, SURVEY.md §2.7/§5 — reference
    inference.py:48-53 runs full frames single-device). Exactness
    argument in the section comment above; asserted on the virtual mesh
    by tests/test_spatial_quant.py.
    """
    from fast_srgan_tpu import quant as _q

    mesh_axis, batch_axis = _resolve_mesh_axes(mesh, axis_name)
    sp_size = mesh.shape[mesh_axis]
    tails = {
        2: _sharded_q_tail_2x, 4: _sharded_q_tail_4x, 8: _sharded_q_tail_8x
    }
    if scale_factor not in tails:
        raise ValueError(f"scale_factor must be 2, 4, or 8: {scale_factor}")

    def sharded(qp, scales, x):
        ex = _q._Exec(scales=scales, collect=None, glue_dtype=glue_dtype)
        y = _sharded_q_trunk(qp, ex, x.astype(glue_dtype), mesh_axis)
        return tails[scale_factor](qp, ex, y, mesh_axis)

    mapped = jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P(), P(batch_axis, None, mesh_axis, None)),
        out_specs=P(batch_axis, None, mesh_axis, None),
    )

    @jax.jit
    def forward(qparams, act_scales, x):
        qp = qparams["params"] if "params" in qparams else qparams
        if x.shape[2] % sp_size != 0:
            raise ValueError(
                f"width {x.shape[2]} not divisible by spatial axis size "
                f"{sp_size}"
            )
        if batch_axis is not None and x.shape[0] % mesh.shape[batch_axis]:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by {batch_axis!r} axis "
                f"size {mesh.shape[batch_axis]}"
            )
        return mapped(qp, act_scales, x)

    return forward
