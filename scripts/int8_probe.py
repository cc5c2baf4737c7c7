"""Probe: does an int8 conv beat bf16 on this TPU at Fast-SRGAN shapes?

Decision experiment for a quantized inference tier. The 720p operating
point sits at the roofline ridge (DESIGN.md "Roofline at the operating
point"): arithmetic intensity ~237 flop/byte vs v5e machine balance ~240,
so neither engine alone has headroom — but int8 halves *both* roofs
(double MXU rate, half the activation bytes). This script measures the
core op (3x3 conv at the generator's body shape, NHWC) in bf16 vs
int8xint8->int32 (+ the requantize epilogue a real pipeline pays) to
decide whether a quantized tier is worth building.

Timing protocol is bench.py's: through the dev tunnel block_until_ready
returns early, so each program also returns a 4-byte int32 checksum and
the fetch of that scalar is the completion barrier. A scan of `depth`
dependent convs amortizes the dispatch RTT inside one program. Weights
are scaled ~1/sqrt(9*C) so 16 bf16 layers neither overflow nor denormal.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def conv(x, w, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )


def bench(chain, args, iters=8, repeats=3):
    out, ck = chain(*args)
    int(ck)  # compile + completion barrier
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out, ck = chain(out, *args[1:])
        int(ck)  # single 4-byte fetch = barrier over the dependent chain
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--hw", type=str, default="180x320")
    p.add_argument("--filters", type=int, default=64)
    p.add_argument("--depth", type=int, default=16)
    p.add_argument("--tuned", action="store_true",
                   help="apply utils.xla_opts tuned compiler options")
    args = p.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))
    f = args.filters
    rng = np.random.default_rng(0)

    copts = None
    if args.tuned:
        from fast_srgan_tpu.utils.xla_opts import tuned_compiler_options
        copts = tuned_compiler_options()

    shape = (args.batch, h, w, f)
    # unit-variance-preserving scale so a 16-deep bf16 chain stays finite
    wscale = 1.0 / np.sqrt(9 * f)
    x8 = jnp.asarray(rng.integers(-127, 128, shape, dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, f, f), dtype=np.int8))
    xb = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((3, 3, f, f)) * wscale, jnp.bfloat16)

    flop = 2 * args.batch * h * w * f * f * 9 * args.depth

    import functools as ft

    @ft.partial(jax.jit, compiler_options=copts)
    def bf16_chain(x, w):
        def body(hc, _):
            return conv(hc, w).astype(jnp.bfloat16), ()
        hh, _ = jax.lax.scan(body, x, None, length=args.depth)
        return hh, jnp.sum(hh, dtype=jnp.int32)

    t_bf = bench(bf16_chain, (xb, wb))
    print(f"bf16  conv chain: {t_bf*1e3:8.2f} ms  "
          f"{flop/t_bf/1e12:6.1f} TFLOP/s")

    # int8 matmul engine, fp32 rescale + clip + round back to int8 — the
    # requantize epilogue a real static-PTQ pipeline pays per layer
    @ft.partial(jax.jit, compiler_options=copts)
    def int8_chain(x, w, scale):
        def body(hc, _):
            y = conv(hc, w, jnp.int32)
            yq = jnp.clip(
                jnp.round(y.astype(jnp.float32) * scale), -127, 127
            ).astype(jnp.int8)
            return yq, ()
        hh, _ = jax.lax.scan(body, x, None, length=args.depth)
        return hh, jnp.sum(hh, dtype=jnp.int32)

    scale = jnp.float32(1.0 / (9 * f * 42))  # keep values in-range
    t_i8 = bench(int8_chain, (x8, w8, scale))
    print(f"int8+requant    : {t_i8*1e3:8.2f} ms  "
          f"{flop/t_i8/1e12:6.1f} TOP/s   speedup {t_bf/t_i8:.2f}x")

    # pure int8->int32 accumulate, no epilogue (upper bound for the engine)
    @ft.partial(jax.jit, compiler_options=copts)
    def int8_raw_chain(x, w):
        def body(hc, _):
            y = conv(hc, w, jnp.int32)
            return jnp.clip(y, -127, 127).astype(jnp.int8), ()
        hh, _ = jax.lax.scan(body, x, None, length=args.depth)
        return hh, jnp.sum(hh, dtype=jnp.int32)

    t_raw = bench(int8_raw_chain, (x8, w8))
    print(f"int8 raw        : {t_raw*1e3:8.2f} ms  "
          f"{flop/t_raw/1e12:6.1f} TOP/s   speedup {t_bf/t_raw:.2f}x")

    # int8 convs with FLOAT GLUE between them — the memory pattern the real
    # static-PTQ graph (quant.py) actually has: every conv output
    # dequantizes to bf16 for the float ops between convs (instance norm /
    # PReLU / bias), then requantizes for the next conv. Activations move
    # at bf16 width (no bandwidth halving) and the quantize pass is extra
    # work. This arm is the honest upper bound for quant.py's design;
    # the int8-in/int8-out chains above are only reachable by an
    # all-integer pipeline with no float ops between convs.
    @ft.partial(jax.jit, compiler_options=copts)
    def int8_glue_chain(x, w, scale):
        def body(hc, _):
            hq = jnp.clip(
                jnp.round(hc.astype(jnp.float32) * 127.0), -127, 127
            ).astype(jnp.int8)
            y = conv(hq, w, jnp.int32)
            yf = y.astype(jnp.float32) * scale  # dequant for float glue
            return jnp.tanh(yf).astype(jnp.bfloat16), ()

        hh, _ = jax.lax.scan(body, x, None, length=args.depth)
        return hh, jnp.sum(hh, dtype=jnp.int32)

    # matched bf16 baseline with the same glue op, so the comparison
    # isolates the conv engine + quant passes (not the tanh)
    @ft.partial(jax.jit, compiler_options=copts)
    def bf16_glue_chain(x, w):
        def body(hc, _):
            return jnp.tanh(conv(hc, w)).astype(jnp.bfloat16), ()

        hh, _ = jax.lax.scan(body, x, None, length=args.depth)
        return hh, jnp.sum(hh, dtype=jnp.int32)

    t_bg = bench(bf16_glue_chain, (xb, wb))
    t_ig = bench(int8_glue_chain, (xb, w8, scale))
    print(f"bf16 +glue      : {t_bg*1e3:8.2f} ms  "
          f"{flop/t_bg/1e12:6.1f} TFLOP/s")
    print(f"int8 +float glue: {t_ig*1e3:8.2f} ms  "
          f"{flop/t_ig/1e12:6.1f} TOP/s   speedup {t_bg/t_ig:.2f}x")


if __name__ == "__main__":
    main()
