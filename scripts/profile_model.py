#!/usr/bin/env python
"""Profiling harness: XLA cost analysis + optional jax.profiler trace.

The reference had no profiling tooling (its timing script was git-ignored —
reference .gitignore:7, SURVEY.md §5); this is the first-class replacement:

    python scripts/profile_model.py                     # generator forward
    python scripts/profile_model.py --step gan          # full GAN train step
    python scripts/profile_model.py --trace runs/prof   # + profiler trace
    python scripts/profile_model.py --shape 16x540x960  # custom input

Prints the compiled program's FLOPs / HBM bytes / estimated optimal seconds
(from XLA's own cost model), the arithmetic intensity, and — with --trace —
writes a TensorBoard-loadable trace directory.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--step", choices=["forward", "gan", "pretrain"], default="forward"
    )
    parser.add_argument("--shape", default="16x180x320", help="BxHxW input")
    parser.add_argument("--trace", default=None, help="trace output dir")
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument(
        "--lr_tail", action="store_true",
        help="profile the LR-domain tail forward (ops/lr_tail.py)",
    )
    parser.add_argument(
        "--vgg", action="store_true",
        help="--step gan: include the VGG19 perceptual content loss "
        "(training.vgg_weights='init' — the reference formulation's cost)",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="--step forward: profile the production int8 tier "
        "(ups-only PTQ, fast_srgan_tpu/quant.py)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    b, h, w = (int(v) for v in args.shape.split("x"))
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16

    if args.step == "forward":
        from __graft_entry__ import entry
        from fast_srgan_tpu.models import Generator

        _, (params, _) = entry()
        model = Generator(n_filters=64, n_layers=8, dtype=dtype)

        if args.int8:
            from fast_srgan_tpu import quant

            scales = quant.calibrate_scales(
                params, [quant.default_calibration_batch(h=96, w=160)],
                scale_factor=4,
            )
            qtree = quant.quantize_generator_params(
                params, only=quant.is_ups_module
            )
            params = {"q": qtree, "s": scales}

            def fn(p, x):
                return quant.sr_quant_forward(
                    p["q"], p["s"], x, scale_factor=4, glue_dtype=dtype
                )
        elif args.lr_tail:
            from fast_srgan_tpu.ops.lr_tail import generator_apply_lr_tail

            def fn(p, x):
                return generator_apply_lr_tail(model, p, x)
        else:
            def fn(p, x):
                return model.apply(p, x)

        example = (params, jnp.zeros((b, h, w, 3), jnp.float32))
    else:
        from fast_srgan_tpu.config import default_config
        from fast_srgan_tpu.train.steps import build_bundle

        # --shape is the HR crop batch for the train steps: BxHxW with
        # H == W (training crops are square; reference dataloader.py:27-31).
        if h != w or h % 4 != 0:
            raise SystemExit(
                f"--step {args.step} needs square HR crops divisible by 4, "
                f"got {h}x{w}"
            )
        config = default_config(
            training={
                "bf16": not args.fp32,
                "vgg_weights": "init" if args.vgg else "pixel",
            },
            data={"lr_image_size": h // 4, "scale_factor": 4},
        )
        bundle, g_state, d_state, vgg_params = build_bundle(config)

        if args.step == "pretrain":
            def fn(g, batch):
                return bundle.pretrain_step.__wrapped__(g, batch)

            example = (g_state, jnp.zeros((b, h, w, 3), jnp.uint8))
        else:
            def fn(g, d, v, batch, key):
                return bundle.gan_step.__wrapped__(g, d, v, batch, key)

            example = (
                g_state, d_state, vgg_params,
                jnp.zeros((b, h, w, 3), jnp.uint8), jax.random.key(0),
            )

    lowered = jax.jit(fn).lower(*example)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    flops = cost.get("flops", float("nan"))
    bytes_ = cost.get("bytes accessed", float("nan"))
    seconds = cost.get("optimal_seconds", float("nan"))
    print(f"program        : {args.step} @ {args.shape} {dtype.__name__}")
    print(f"flops          : {flops / 1e9:.2f} GFLOP")
    print(f"hbm bytes      : {bytes_ / 1e6:.2f} MB")
    if flops and bytes_:
        print(f"arith intensity: {flops / max(bytes_, 1):.1f} flop/byte")
    if seconds == seconds and seconds > 0:
        # (the cost model returns nonsense negatives for some programs)
        print(f"xla optimal    : {seconds * 1e3:.3f} ms")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"peak temp HBM  : {getattr(mem, 'temp_size_in_bytes', 0) / 1e6:.1f} MB")

    if args.trace:
        out = jax.block_until_ready(compiled(*example))
        with jax.profiler.trace(args.trace):
            out = compiled(*example)
            jax.block_until_ready(out)
        del out
        print(f"trace written  : {args.trace} (tensorboard --logdir {args.trace})")


if __name__ == "__main__":
    main()
