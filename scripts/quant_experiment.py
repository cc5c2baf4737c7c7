#!/usr/bin/env python
"""Prototype: int8 (weights + activations) generator inference.

Measures (a) output quality of an int8-quantized pretrained generator vs the
fp32 graph and (b) throughput vs bf16 with the checksum-barrier protocol.
Per-output-channel weight scales; per-layer static activation absmax scales
from calibration crops.

RESULT (v5e, 2026-08-16) — THIS formulation (per-layer dequant to fp32 at
every boundary) is 2x slower and stays out of the production path:
    int8 vs fp32 quality : 34.1 dB PSNR (marginal for SR)
    bf16                 : 71.9 ms/batch16 -> 222.5 fps
    int8                 : 144.2 ms/batch16 -> 110.9 fps  (2x SLOWER)
The per-layer quantize/dequantize chains add HBM passes that swamp the MXU
gain. SUPERSEDED in part (2026-08-19): the unified executor in
fast_srgan_tpu/quant.py with fused requantize epilogues measured the full
graph at 0.87x (still a loss), TAIL-ONLY quantization at 1.12x, and
UPS-ONLY (upsampling stages int8, trunk AND head float) at 1.25x — 579.8
fps at batch 112 vs bf16's 463.7, 41.91 dB — the production int8 tier.
Full reconciled story: docs/DESIGN.md "int8 decision record (rounds 2-4)".
Kept as a reproducible experiment record.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from fast_srgan_tpu.checkpoints.torch_compat import (  # noqa: E402
    load_reference_generator_params,
)
from fast_srgan_tpu.models import Generator  # noqa: E402
from fast_srgan_tpu.ops.norm import instance_norm_nhwc  # noqa: E402
from fast_srgan_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc  # noqa: E402
from fast_srgan_tpu.utils.jax_cache import enable  # noqa: E402

enable()

CONV_ORDER = (
    ["neck_conv"]
    + [f"stem_{i}.conv{j}" for i in range(8) for j in (1, 2)]
    + ["bottleneck_conv", "upsampling_0.conv", "upsampling_1.conv",
       "head_conv"]
)


def get_node(p, name):
    if "." in name:
        a, b = name.split(".")
        return p[a][b]
    return p[name]


def forward_instrumented(p, x, record):
    """fp32 forward that records each conv's input absmax into `record`."""
    def prelu(t, alpha):
        return jnp.where(t >= 0, t, alpha.astype(t.dtype) * t)

    def conv(t, name):
        record[name] = jnp.max(jnp.abs(t))
        node = get_node(p, name)
        y = lax.conv_general_dilated(
            t, node["kernel"], (1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if "bias" in node:
            y = y + node["bias"]
        return y

    r = prelu(conv(x, "neck_conv"), p["neck_relu"]["alpha"])
    y = r
    for i in range(8):
        blk = p[f"stem_{i}"]
        t = prelu(instance_norm_nhwc(conv(y, f"stem_{i}.conv1")), blk["relu1"]["alpha"])
        y = instance_norm_nhwc(conv(t, f"stem_{i}.conv2")) + y
    y = instance_norm_nhwc(conv(y, "bottleneck_conv")) + r
    for j in range(2):
        blk = p[f"upsampling_{j}"]
        y = prelu(pixel_shuffle_nhwc(conv(y, f"upsampling_{j}.conv"), 2), blk["relu"]["alpha"])
    return jnp.tanh(conv(y, "head_conv"))


def quantize_weights(p):
    """Per-output-channel symmetric int8 weights."""
    q = {}
    for name in CONV_ORDER:
        node = get_node(p, name)
        k = np.asarray(node["kernel"], np.float32)  # HWIO
        s = np.abs(k).max(axis=(0, 1, 2)) / 127.0  # [O]
        s = np.maximum(s, 1e-12)
        kq = np.clip(np.round(k / s), -127, 127).astype(np.int8)
        q[name] = {"kq": kq, "ws": s.astype(np.float32)}
        if "bias" in node:
            q[name]["bias"] = np.asarray(node["bias"], np.float32)
    return q


def forward_int8(p, q, scales, x):
    """int8 conv path: activations quantized per-layer, MXU int8 matmuls."""
    def prelu(t, alpha):
        return jnp.where(t >= 0, t, alpha.astype(t.dtype) * t)

    def qconv(t, name):
        s_in = scales[name]
        tq = jnp.clip(jnp.round(t / s_in), -127, 127).astype(jnp.int8)
        node = q[name]
        y = lax.conv_general_dilated(
            tq, node["kq"], (1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (s_in * node["ws"])
        if "bias" in node:
            y = y + node["bias"]
        return y

    r = prelu(qconv(x, "neck_conv"), p["neck_relu"]["alpha"])
    y = r
    for i in range(8):
        blk = p[f"stem_{i}"]
        t = prelu(instance_norm_nhwc(qconv(y, f"stem_{i}.conv1")), blk["relu1"]["alpha"])
        y = instance_norm_nhwc(qconv(t, f"stem_{i}.conv2")) + y
    y = instance_norm_nhwc(qconv(y, "bottleneck_conv")) + r
    for j in range(2):
        blk = p[f"upsampling_{j}"]
        y = prelu(pixel_shuffle_nhwc(qconv(y, f"upsampling_{j}.conv"), 2), blk["relu"]["alpha"])
    return jnp.tanh(qconv(y, "head_conv"))


def main():
    params = load_reference_generator_params("/root/reference/models/model.pt")
    p = params["params"]
    rng = np.random.default_rng(0)

    # --- calibrate on random crops (structured gradient + noise) ---
    yy, xx = np.mgrid[0:96, 0:96]
    calib = np.stack([
        np.stack([yy * 255 // 96, xx * 255 // 96, (yy + xx) * 255 // 192], -1)
        for _ in range(4)
    ]).astype(np.float32)
    calib += rng.normal(0, 12, calib.shape)
    calib = np.clip(calib, 0, 255) / 127.5 - 1.0

    @jax.jit
    def calibrate(xc):
        record = {}
        forward_instrumented(p, xc, record)
        return record

    record = calibrate(jnp.asarray(calib, jnp.float32))
    scales = {k: float(v) / 127.0 for k, v in record.items()}
    print("calibrated", len(scales), "activation scales", flush=True)

    q = quantize_weights(p)

    # --- quality on a held-out image ---
    test = rng.uniform(0, 255, (1, 90, 160, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:90, 0:160]
    test = 0.5 * test + 0.5 * np.stack(
        [yy * 255 / 90, xx * 255 / 160, (yy + xx) * 255 / 250], -1
    )[None]
    test = test / 127.5 - 1.0
    x = jnp.asarray(test, jnp.float32)

    f32 = np.asarray(jax.jit(lambda xi: forward_instrumented(p, xi, {}))(x))
    i8 = np.asarray(jax.jit(lambda xi: forward_int8(p, q, scales, xi))(x))
    u32 = np.clip((f32 + 1) * 127.5, 0, 255).astype(np.uint8)
    u8q = np.clip((i8 + 1) * 127.5, 0, 255).astype(np.uint8)
    mse = ((u32.astype(float) - u8q.astype(float)) ** 2).mean()
    print(f"int8 vs fp32: PSNR {10 * np.log10(255**2 / max(mse, 1e-9)):.2f} dB, "
          f"max|diff| {np.abs(u32.astype(int) - u8q.astype(int)).max()}")

    # --- throughput (checksum protocol), int8 vs bf16 ---
    B, H, W = 16, 180, 320
    xb = jax.device_put(rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32))

    model = Generator(n_filters=64, n_layers=8, dtype=jnp.bfloat16)

    @jax.jit
    def f_bf16(x):
        y = model.apply(params, x)
        return jnp.sum(((y + 1) * 127.5).astype(jnp.uint8), dtype=jnp.int32)

    @jax.jit
    def f_int8(x):
        y = forward_int8(p, q, scales, x)
        return jnp.sum(((y + 1) * 127.5).astype(jnp.uint8), dtype=jnp.int32)

    for name, f in [("bf16", f_bf16), ("int8", f_int8)]:
        int(f(xb))  # compile
        t0 = time.perf_counter()
        cks = [f(xb) for _ in range(30)]
        for ck in cks:
            int(ck)
        dt = (time.perf_counter() - t0) / 30
        print(f"{name}: {dt * 1000:.1f} ms/batch16 -> {B / dt:.1f} fps")


if __name__ == "__main__":
    main()
