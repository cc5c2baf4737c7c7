#!/usr/bin/env python
"""Experiment: phase-summed head vs concat head in the 4x LR-domain tail.

The LR-tail head (ops/lr_tail.py) currently concatenates the four stage-2
phase tensors into one [B,H,W,16F] map before the dense head conv. At the
int8 operating point (batch 112 at 180x320) that 1024-channel tensor is
~13 GB — the HBM watermark (14.87 of 16 GB, docs/DESIGN.md "Roofline
after int8") and the reason batch 128 OOMs.

Because the head kernel's input channels are phase-major
(_head_kernel_4x docstring) and the stage-2 PReLU slope is a single
shared scalar (commutes with concat), the head decomposes EXACTLY:

    conv(prelu(concat(phases)), Kd) == sum_p conv(prelu(phase_p), Kd_p)

where Kd_p = Kd[:, :, p*4F:(p+1)*4F, :]. The summed form never
materializes the 16F tensor, cutting the watermark by ~2 x 13 GB at
batch 112 — potentially unlocking larger batches for BOTH precisions.

This script measures ms/batch + max-batch-before-OOM for the current
and summed forms, bf16 and int8-ups arms, and checks exactness. The
verdict (and whether production flips) is recorded in docs/DESIGN.md.

Timing protocol: bench.py's checksum barrier.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fast_srgan_tpu.utils import jax_cache  # noqa: E402

jax_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from fast_srgan_tpu import quant  # noqa: E402
from fast_srgan_tpu.models import Generator  # noqa: E402
from fast_srgan_tpu.ops.lr_tail import (  # noqa: E402
    _head_kernel_4x,
    _phase_kernels_2x,
    generator_apply_lr_tail,
)
from fast_srgan_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc  # noqa: E402
from fast_srgan_tpu.utils.xla_opts import tuned_compiler_options  # noqa: E402

_DN = ("NHWC", "HWIO", "NHWC")
PAD1 = ((1, 1), (1, 1))


def _conv(x, k, padding, out_dtype=None):
    return lax.conv_general_dilated(
        x, k, (1, 1), padding, dimension_numbers=_DN,
        preferred_element_type=out_dtype,
    )


def bf16_summed_forward(model, variables, x):
    """Generator forward with the LR tail, phase-summed head (bf16)."""
    p = variables["params"] if "params" in variables else variables
    dt = jnp.bfloat16
    y = model.apply({"params": p}, x, trunk_only=True).astype(dt)
    up0, up1, head = p["upsampling_0"], p["upsampling_1"], p["head_conv"]

    a1 = _conv(y, up0["conv"]["kernel"].astype(dt), PAD1)
    a1 = a1 + up0["conv"]["bias"].astype(dt)
    al1 = up0["relu"]["alpha"].astype(dt)
    a1 = jnp.where(a1 >= 0, a1, al1 * a1)

    k2 = _phase_kernels_2x(up1["conv"]["kernel"]).items()
    b2 = up1["conv"]["bias"].astype(dt)
    al2 = up1["relu"]["alpha"].astype(dt)
    kd = _head_kernel_4x(head["kernel"])
    f4 = a1.shape[-1]  # 4F
    z = None
    for i, ((pp, q), kp) in enumerate(k2):
        ph = _conv(a1, kp.astype(dt), ((1 - pp, pp), (1 - q, q))) + b2
        ph = jnp.where(ph >= 0, ph, al2 * ph)
        kd_p = kd[:, :, i * f4 : (i + 1) * f4, :].astype(dt)
        # fp32 partials: the head's 1024-long contraction is split into
        # four 256-long pieces — accumulating the pieces in fp32 keeps the
        # split reduction at the one-conv form's precision (the conv
        # itself accumulates fp32 internally either way)
        part = _conv(ph, kd_p, PAD1, out_dtype=jnp.float32)
        z = part if z is None else z + part
    z = z + jnp.repeat(head["bias"], 16).astype(jnp.float32)
    z = jnp.tanh(z)
    return pixel_shuffle_nhwc(z, 4)


def int8_summed_forward(qp, scales, x):
    """ups-only int8 forward with the phase-summed head (bf16 glue)."""
    dt = jnp.bfloat16
    ex = quant._Exec(scales=scales, collect=None, glue_dtype=dt)
    y = quant._trunk(qp, ex, x.astype(dt))

    a1 = quant._stage_conv(qp, ex, y, "up0", qp["upsampling_0"])
    leaf = qp["upsampling_1"]["conv"]
    b2 = leaf["bias"].astype(dt)
    al2 = qp["upsampling_1"]["relu"]["alpha"].astype(dt)
    head = qp["head_conv"]
    kd = _head_kernel_4x(head["kernel"])  # float head (ups-only tree)
    a1q = ex.qin("up1", a1)
    f4 = a1.shape[-1]
    z = None
    for i, ((pp, q), kp) in enumerate(
        quant._phase_kernels_2x(leaf["qkernel"]).items()
    ):
        ph = ex.conv_q(a1q, "up1", kp, leaf["wscale"],
                       ((1 - pp, pp), (1 - q, q))) + b2
        ph = jnp.where(ph >= 0, ph, al2 * ph)
        kd_p = kd[:, :, i * f4 : (i + 1) * f4, :].astype(dt)
        part = _conv(ph, kd_p, PAD1, out_dtype=jnp.float32)
        z = part if z is None else z + part
    z = z + jnp.repeat(head["bias"], 16).astype(jnp.float32)
    z = jnp.tanh(z)
    return pixel_shuffle_nhwc(z, 4)


def bench(fn, args_, iters=8, repeats=3):
    out, ck = fn(*args_)
    int(ck)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out, ck = fn(*args_)
            del out
        int(ck)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="180x320")
    p.add_argument("--bf16_batches", default="96,112,128")
    p.add_argument("--int8_batches", default="112,128,144,160")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--skip_exactness", action="store_true")
    p.add_argument(
        "--only", default=None,
        help="comma-separated arm substrings to run (e.g. 'summed') — "
        "skipping the known-OOM arm keeps HBM unfragmented for the rest",
    )
    args = p.parse_args()
    h, w = map(int, args.shape.split("x"))

    from infer import load_generator_params, resolve_default_checkpoint

    params = load_generator_params(resolve_default_checkpoint())
    model = Generator(n_filters=64, n_layers=8, dtype=jnp.bfloat16)
    copts = tuned_compiler_options()
    rng = np.random.default_rng(0)

    result = {"device": str(jax.devices()[0].device_kind),
              "shape": args.shape}

    # --- exactness (fp32-level check on a small input, current vs summed)
    if not args.skip_exactness:
        xs = jnp.asarray(
            rng.uniform(-1, 1, (2, 24, 32, 3)).astype(np.float32)
        )
        cur = generator_apply_lr_tail(model, params, xs)
        new = bf16_summed_forward(model, params, xs)
        d_bf16 = float(jnp.max(jnp.abs(
            cur.astype(jnp.float32) - new.astype(jnp.float32)
        )))
        scales = quant.calibrate_scales(params, [xs], scale_factor=4)
        ups = quant.quantize_generator_params(
            params, only=quant.is_ups_module
        )
        cur8 = quant.sr_quant_forward(ups, scales, xs, 4,
                                      glue_dtype=jnp.bfloat16)
        new8 = int8_summed_forward(ups, scales, xs)
        d_i8 = float(jnp.max(jnp.abs(
            cur8.astype(jnp.float32) - new8.astype(jnp.float32)
        )))
        result["maxabs_diff_bf16"] = d_bf16
        result["maxabs_diff_int8"] = d_i8
        print(f"# exactness: bf16 {d_bf16:.2e}, int8 {d_i8:.2e}",
              file=sys.stderr, flush=True)

    scales = quant.calibrate_scales(
        params, [quant.default_calibration_batch(h=96, w=160)],
        scale_factor=4,
    )
    ups = quant.quantize_generator_params(params, only=quant.is_ups_module)
    params_d = jax.device_put(params)
    ups_d = jax.device_put(ups)
    scales_d = jax.device_put(scales)

    @functools.partial(jax.jit, compiler_options=copts)
    def f_bf16_cur(pr, x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        y = generator_apply_lr_tail(model, pr, x)
        u = ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)
        return u, jnp.sum(u, dtype=jnp.int32)

    @functools.partial(jax.jit, compiler_options=copts)
    def f_bf16_sum(pr, x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        y = bf16_summed_forward(model, pr, x)
        u = ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)
        return u, jnp.sum(u, dtype=jnp.int32)

    @functools.partial(jax.jit, compiler_options=copts)
    def f_i8_cur(qp, s, x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        y = quant.sr_quant_forward(qp, s, x, 4, glue_dtype=jnp.bfloat16)
        u = ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)
        return u, jnp.sum(u, dtype=jnp.int32)

    @functools.partial(jax.jit, compiler_options=copts)
    def f_i8_sum(qp, s, x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        y = int8_summed_forward(qp, s, x)
        u = ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)
        return u, jnp.sum(u, dtype=jnp.int32)

    def arm(fn, mk_args, b):
        try:
            x_u8 = jax.device_put(
                rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
            )
            ms = bench(fn, mk_args(x_u8), args.iters)
        except Exception as e:
            msg = str(e).lower()
            if "resource_exhausted" in msg or "out of memory" in msg:
                import gc

                gc.collect()
                return {"oom": True}
            raise
        return {"ms": round(ms, 2), "fps": round(b / ms * 1e3, 1)}

    def batches(spec):
        return [int(v) for v in spec.split(",") if v.strip()]

    wanted = args.only.split(",") if args.only else None

    def want(name):
        return wanted is None or any(s in name for s in wanted)

    arms = {}
    for b in batches(args.bf16_batches):
        row = {}
        if want("bf16_concat"):
            row["bf16_concat"] = arm(f_bf16_cur, lambda x: (params_d, x), b)
        if want("bf16_summed"):
            row["bf16_summed"] = arm(f_bf16_sum, lambda x: (params_d, x), b)
        arms[f"bf16_{b}"] = row
        print(f"# b{b}: {json.dumps(row)}", file=sys.stderr, flush=True)
    for b in batches(args.int8_batches):
        row = {}
        if want("int8_concat"):
            row["int8_concat"] = arm(
                f_i8_cur, lambda x: (ups_d, scales_d, x), b
            )
        if want("int8_summed"):
            row["int8_summed"] = arm(
                f_i8_sum, lambda x: (ups_d, scales_d, x), b
            )
        arms[f"int8_{b}"] = row
        print(f"# b{b}: {json.dumps(row)}", file=sys.stderr, flush=True)
    result["arms"] = arms
    print(json.dumps(result))


if __name__ == "__main__":
    main()
