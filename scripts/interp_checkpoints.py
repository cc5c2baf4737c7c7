#!/usr/bin/env python
"""Network interpolation / weight averaging over generator checkpoints.

The standard SRGAN-family fidelity-vs-perception dial (ESRGAN Sec. 3.4
"network interpolation"): linearly blend the parameters of a
PSNR-oriented model (here: the pretrain-phase generator) and a
GAN-trained model of the SAME architecture,

    theta = (1 - alpha) * theta_psnr + alpha * theta_gan,

sweeping alpha in [0, 1] trades restoration fidelity for perceptual
sharpness without retraining. The general form implemented here blends
N checkpoints with arbitrary weights, which also covers plain checkpoint
averaging (equal weights over the last k checkpoints — a cheap
stabilizer when ``training.ema_decay`` wasn't enabled during the run).

The upstream repo has no equivalent tool (its artifacts are single
``state_dict`` files, reference trainer.py:143-156); this composes with
the checkpoint interop: inputs may be native ``.npz`` or reference-format
``.pt`` files in any mix, output is ``.npz`` (directly loadable by every
CLI here, convertible to ``.pt`` with scripts/convert_checkpoint.py).

    # ESRGAN-style interpolation (alpha = GAN share):
    python scripts/interp_checkpoints.py --alpha 0.8 \
        pretrain_gen.npz gan_gen.pt -o blend08.npz

    # Average the last 3 checkpoints:
    python scripts/interp_checkpoints.py g1.npz g2.npz g3.npz -o avg.npz

    # Arbitrary weights (normalized automatically):
    python scripts/interp_checkpoints.py --weights 1,2,1 a.npz b.npz c.npz -o w.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fast_srgan_tpu.checkpoints.npz_io import (  # noqa: E402
    flatten_tree,
    save_npz_params,
    unflatten_tree,
)


def blend_param_trees(trees, weights):
    """Weighted sum of N structurally-identical param pytrees (fp32).

    Raises ValueError when key sets or leaf shapes disagree (different
    architectures must not silently blend).
    """
    if len(trees) != len(weights):
        raise ValueError(f"{len(trees)} trees but {len(weights)} weights")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError(f"weights must sum to > 0, got {list(weights)}")
    norm = [float(w) / total for w in weights]

    flats = [flatten_tree(t) for t in trees]
    keys = set(flats[0])
    for i, f in enumerate(flats[1:], start=1):
        if set(f) != keys:
            missing = sorted(keys ^ set(f))[:6]
            raise ValueError(
                f"checkpoint {i} has a different param tree "
                f"(first differing keys: {missing})"
            )
    out = {}
    for k in keys:
        shapes = {f[k].shape for f in flats}
        if len(shapes) > 1:
            raise ValueError(
                f"shape mismatch at {k!r}: {sorted(shapes)} — the "
                "checkpoints are different architectures"
            )
        acc = np.zeros(flats[0][k].shape, np.float32)
        for w, f in zip(norm, flats):
            acc += w * f[k].astype(np.float32)
        out[k] = acc
    return unflatten_tree(out)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoints", nargs="+",
                    help=".npz or reference-format .pt generator files")
    ap.add_argument("-o", "--output", required=True, help="output .npz path")
    ap.add_argument("--alpha", type=float, default=None,
                    help="two-checkpoint interpolation: weight of the "
                    "SECOND checkpoint (ESRGAN alpha); exclusive "
                    "with --weights")
    ap.add_argument("--weights", default=None,
                    help="comma-separated per-checkpoint weights "
                    "(normalized); default: equal (plain average)")
    args = ap.parse_args()

    if args.alpha is not None and args.weights is not None:
        raise SystemExit("--alpha and --weights are mutually exclusive")
    n = len(args.checkpoints)
    if args.alpha is not None:
        if n != 2:
            raise SystemExit("--alpha needs exactly 2 checkpoints")
        if not 0.0 <= args.alpha <= 1.0:
            raise SystemExit(f"--alpha must be in [0, 1], got {args.alpha}")
        weights = [1.0 - args.alpha, args.alpha]
    elif args.weights is not None:
        weights = [float(w) for w in args.weights.split(",")]
        if len(weights) != n:
            raise SystemExit(
                f"{len(weights)} weights for {n} checkpoints"
            )
    else:
        weights = [1.0] * n

    from infer import load_generator_params
    from fast_srgan_tpu.inference import arch_from_params

    trees, arch = [], None
    for path in args.checkpoints:
        params = load_generator_params(path)
        a = arch_from_params(params)
        if arch is None:
            arch = a
        elif a != arch:
            raise SystemExit(
                f"architecture mismatch: {args.checkpoints[0]} is {arch}, "
                f"{path} is {a}"
            )
        trees.append(params)
        print(f"  {path}: {a}")

    blended = blend_param_trees(trees, weights)
    save_npz_params(args.output, blended)
    total = sum(weights)
    print(
        f"wrote {args.output}: "
        + " + ".join(
            f"{w / total:.3f}*{os.path.basename(p)}"
            for w, p in zip(weights, args.checkpoints)
        )
    )


if __name__ == "__main__":
    main()
