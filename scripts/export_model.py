#!/usr/bin/env python
"""Export a checkpoint as serialized StableHLO deployment artifacts.

The TPU-native deployment unit (fast_srgan_tpu/export.py): the jitted
uint8->uint8 SR forward, weights embedded, lowered per input shape and
serialized with jax.export — loadable by any JAX runtime with
``fast_srgan_tpu.export.load_exported_dir`` (no model code, no checkpoint
plumbing on the serving side). The reference has no deployment format
beyond the raw .pt state_dict (reference inference.py:26-35).

    python scripts/export_model.py --output /tmp/sr_artifact \
        [--checkpoint models/generator_pretrained.npz] \
        [--shape 1x180x320] [--shape 8x90x160] \
        [--platforms cpu,tpu] [--fp32] [--no-lr-tail] [--no-check]

Each --shape is BxHxW of the LR input. The default platform list
"cpu,tpu" lowers for both in one artifact (export here, serve on TPU);
--check deserializes every blob and verifies (1) bit-identical uint8
output vs the jit of the exported closure (serialize/deserialize
integrity) and (2) parity with the live SRInferenceEngine within 2 uint8
counts (params-as-constants vs params-as-arguments bf16 folding).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shape", action="append", default=[],
                    help="BxHxW LR input shape, repeatable (default 1x180x320)")
    ap.add_argument("--platforms", default="cpu,tpu")
    ap.add_argument("--fp32", action="store_true",
                    help="fp32 compute (default bf16)")
    ap.add_argument("--no-lr-tail", action="store_true")
    ap.add_argument("--no-check", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="bake the production int8 PTQ tier (ups-only "
                    "policy) into the artifact: int8 kernels, dequant "
                    "scales, and activation scales (calibrated on "
                    "--calib_dir images if given, else a synthetic batch) "
                    "all become constants — no calibration at load time")
    ap.add_argument("--calib_dir", default=None,
                    help="sample images to calibrate int8 activation "
                    "scales on (--int8 only)")
    args = ap.parse_args()

    from fast_srgan_tpu.utils.platforms import honor_env_platforms

    honor_env_platforms()  # JAX_PLATFORMS env beats sitecustomize

    from infer import load_generator_params, resolve_default_checkpoint
    from fast_srgan_tpu.export import (
        build_forward_u8,
        export_shape,
        save_exported_dir,
    )
    from fast_srgan_tpu.inference import arch_from_params

    ckpt = args.checkpoint
    if ckpt is None:
        ckpt = resolve_default_checkpoint()
    params = load_generator_params(ckpt)
    arch = arch_from_params(params)
    print(f"checkpoint {ckpt}: {arch}")

    shapes = []
    for s in args.shape or ["1x180x320"]:
        b, h, w = (int(v) for v in s.lower().split("x"))
        shapes.append((b, h, w))
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]

    calib = None
    if args.int8:
        from fast_srgan_tpu import quant

        if args.calib_dir:
            from PIL import Image

            imgs = []
            for name in sorted(os.listdir(args.calib_dir))[:8]:
                try:
                    imgs.append(np.asarray(
                        Image.open(os.path.join(args.calib_dir, name))
                        .convert("RGB")
                    ))
                except Exception:
                    continue
            batch = quant.calibration_batch_from_images(imgs)
            calib = [batch] if batch is not None else None
        if calib is None:
            calib = [quant.default_calibration_batch()]

    forward = build_forward_u8(
        params,
        n_filters=arch["n_filters"],
        n_layers=arch["n_layers"],
        scale_factor=arch["scale_factor"],
        bf16=not args.fp32,
        lr_tail=not args.no_lr_tail,
        quantize=args.int8,
        calib_batches=calib,
    )
    entries = []
    for b, h, w in shapes:
        # Progress per shape: each lowering is a full trace+compile and
        # can take minutes on a cold cache — a multi-shape export must
        # not look hung until the last one finishes.
        print(f"  lowering {b}x{h}x{w} ...", flush=True)
        entries.append(((b, h, w), export_shape(
            forward, b, h, w, platforms=platforms
        )))
    manifest = save_exported_dir(
        args.output, entries, arch=arch,
        bf16=not args.fp32, lr_tail=not args.no_lr_tail,
        quantize=args.int8,
    )
    import json

    with open(manifest) as f:
        table = json.load(f)["entries"]
    for e in table:
        print(f"  {e['batch']}x{e['height']}x{e['width']}: "
              f"{e['bytes']/1e6:.2f} MB, platforms {e['platforms']}")
    print(f"wrote {manifest}")

    if not args.no_check:
        import jax

        from fast_srgan_tpu.export import load_exported_dir
        from fast_srgan_tpu.inference import SRInferenceEngine

        # Two-tier self-check:
        #   1. roundtrip (bit-exact): deserialized artifact == jit of the
        #      exported closure — catches serialize/deserialize bugs;
        #   2. serving parity (tolerance): artifact vs the live
        #      SRInferenceEngine on this backend. The engine jits with
        #      params as runtime arguments while the artifact bakes them
        #      in as constants; under bf16, constant folding may
        #      reassociate differently, so last-bit uint8 differences are
        #      expected — gate on max |diff| <= 2 counts, not equality.
        loaded = load_exported_dir(args.output)
        live = jax.jit(forward)
        import jax.numpy as jnp

        # int8: same calib batches => calibrate_scales is deterministic =>
        # the engine and the artifact share identical activation scales.
        engine = SRInferenceEngine(
            params,
            n_filters=arch["n_filters"],
            n_layers=arch["n_layers"],
            scale_factor=arch["scale_factor"],
            dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
            lr_tail=not args.no_lr_tail,
            quantize=args.int8,
            calib_batches=calib,
        )
        rng = np.random.default_rng(0)
        for (b, h, w), call in loaded["forwards"].items():
            x = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
            got = np.asarray(call(x))
            want = np.asarray(live(x))
            if not np.array_equal(got, want):
                raise SystemExit(
                    f"self-check FAILED for {b}x{h}x{w}: artifact output "
                    "differs from the jitted export closure (roundtrip bug)"
                )
            served = np.asarray(engine.upscale_batch(x))
            dmax = int(np.max(np.abs(
                got.astype(np.int16) - served.astype(np.int16)
            )))
            frac = float(np.mean(got != served))
            if dmax > 2:
                raise SystemExit(
                    f"self-check FAILED for {b}x{h}x{w}: artifact vs live "
                    f"SRInferenceEngine max |diff| = {dmax} uint8 counts "
                    f"({frac:.2%} of pixels differ) — beyond bf16 "
                    "constant-folding tolerance (2)"
                )
            print(f"  check {b}x{h}x{w}: roundtrip bit-exact; engine "
                  f"parity max|diff|={dmax} ({frac:.2%} px) "
                  f"({got.shape} uint8)")
        print("self-check OK")


if __name__ == "__main__":
    main()
