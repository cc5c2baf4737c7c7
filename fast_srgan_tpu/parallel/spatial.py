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
  * pixel shuffle, PReLU, tanh are pointwise/local-in-width -> unchanged.

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


def generator_forward(
    p: Dict[str, Any],
    x: jnp.ndarray,
    conv: Callable,
    norm: Callable,
    dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """The reference generator graph (model.py:112-117) over pluggable ops.

    `p` is the inner dict of the Flax param tree (params['params']).
    `conv(x, node)` applies a 3x3 stride-1 conv from a {'kernel', 'bias'?}
    node; `norm(x)` is parameterless instance normalization.
    """

    def prelu(t, alpha):
        a = alpha.astype(t.dtype)
        return jnp.where(t >= 0, t, a * t)

    x = x.astype(dtype)
    r = prelu(conv(x, p["neck_conv"]), p["neck_relu"]["alpha"])
    y = r
    for i in range(_n_stem(p)):
        blk = p[f"stem_{i}"]
        t = prelu(norm(conv(y, blk["conv1"])), blk["relu1"]["alpha"])
        y = norm(conv(t, blk["conv2"])) + y
    y = norm(conv(y, p["bottleneck_conv"])) + r
    n_up = len([k for k in p if k.startswith("upsampling_")])
    for j in range(n_up):
        blk = p[f"upsampling_{j}"]
        y = prelu(pixel_shuffle_nhwc(conv(y, blk["conv"]), 2), blk["relu"]["alpha"])
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
        n = lax.axis_size(axis_name)
        idx = lax.axis_index(axis_name)
        # Send my rightmost column right; receive my left neighbor's.
        from_left = lax.ppermute(
            x[:, :, -1:, :], axis_name, [(i, (i + 1) % n) for i in range(n)]
        )
        # Send my leftmost column left; receive my right neighbor's.
        from_right = lax.ppermute(
            x[:, :, :1, :], axis_name, [(i, (i - 1) % n) for i in range(n)]
        )
        # Global frame edges use zero padding (torch Conv2d padding=1).
        from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
        from_right = jnp.where(
            idx == n - 1, jnp.zeros_like(from_right), from_right
        )
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

@functools.lru_cache(maxsize=8)
def build_tiled_forward(
    mesh: Mesh,
    axis_name: str = "sp",
    dtype: Any = jnp.bfloat16,
):
    """Jitted exact spatially-tiled generator forward over `mesh`.

    Returns fn(params, x) with x [B, H, W, 3] in [-1, 1]; W must be divisible
    by mesh.size (exactness requires no padding — instance norm is global).
    """
    if len(mesh.axis_names) != 1:
        raise ValueError("spatial tiling expects a 1-D mesh")
    (mesh_axis,) = mesh.axis_names

    def sharded(p, x):
        return generator_forward(
            p, x,
            conv=_halo_conv(mesh_axis),
            norm=_dist_instance_norm(mesh_axis),
            dtype=dtype,
        )

    mapped = jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P(None, None, mesh_axis, None)),
        out_specs=P(None, None, mesh_axis, None),
    )

    @jax.jit
    def forward(params, x):
        p = params["params"] if "params" in params else params
        if x.shape[2] % mesh.size != 0:
            raise ValueError(
                f"width {x.shape[2]} not divisible by mesh size {mesh.size}"
            )
        return mapped(p, x)

    return forward


def tiled_upscale_u8(params, frame_u8: np.ndarray, mesh: Mesh, dtype=jnp.bfloat16):
    """Convenience: uint8 HWC frame -> uint8 4x frame, tiled across `mesh`."""
    forward = build_tiled_forward(mesh, dtype=dtype)
    x = jnp.asarray(frame_u8[None]).astype(jnp.float32) / 127.5 - 1.0
    x = jax.device_put(x, NamedSharding(mesh, P(None, None, mesh.axis_names[0], None)))
    y = forward(params, x)
    out = ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)
    return np.asarray(out[0])
