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
--check deserializes every blob and verifies bit-identical uint8 output
vs the live forward on the current backend.
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
    args = ap.parse_args()

    from infer import DEFAULT_CHECKPOINTS, load_generator_params
    from fast_srgan_tpu.export import (
        build_forward_u8,
        export_shape,
        save_exported_dir,
    )
    from fast_srgan_tpu.inference import arch_from_params

    ckpt = args.checkpoint
    if ckpt is None:
        ckpt = next((c for c in DEFAULT_CHECKPOINTS if os.path.exists(c)), None)
        if ckpt is None:
            raise SystemExit(
                f"No checkpoint found; pass --checkpoint "
                f"(searched: {DEFAULT_CHECKPOINTS})"
            )
    params = load_generator_params(ckpt)
    arch = arch_from_params(params)
    print(f"checkpoint {ckpt}: {arch}")

    shapes = []
    for s in args.shape or ["1x180x320"]:
        b, h, w = (int(v) for v in s.lower().split("x"))
        shapes.append((b, h, w))
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]

    forward = build_forward_u8(
        params,
        n_filters=arch["n_filters"],
        n_layers=arch["n_layers"],
        scale_factor=arch["scale_factor"],
        bf16=not args.fp32,
        lr_tail=not args.no_lr_tail,
    )
    entries = []
    for b, h, w in shapes:
        exp = export_shape(forward, b, h, w, platforms=platforms)
        blob = exp.serialize()
        print(f"  {b}x{h}x{w}: {len(blob)/1e6:.2f} MB, "
              f"platforms {exp.platforms}")
        entries.append(((b, h, w), exp))
    manifest = save_exported_dir(
        args.output, entries, arch=arch,
        bf16=not args.fp32, lr_tail=not args.no_lr_tail,
    )
    print(f"wrote {manifest}")

    if not args.no_check:
        import jax

        from fast_srgan_tpu.export import load_exported_dir

        loaded = load_exported_dir(args.output)
        live = jax.jit(forward)  # the artifact IS the jitted program;
        # eager tracing fuses bf16 differently by a few uint8 counts
        rng = np.random.default_rng(0)
        for (b, h, w), call in loaded["forwards"].items():
            x = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
            got = np.asarray(call(x))
            want = np.asarray(live(x))
            if not np.array_equal(got, want):
                raise SystemExit(
                    f"self-check FAILED for {b}x{h}x{w}: artifact output "
                    "differs from the live forward"
                )
            print(f"  check {b}x{h}x{w}: artifact == live forward "
                  f"({got.shape} uint8)")
        print("self-check OK")


if __name__ == "__main__":
    main()
