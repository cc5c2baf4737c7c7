#!/usr/bin/env python
"""Convert checkpoints between reference .pt format and native .npz.

    python scripts/convert_checkpoint.py IN.pt OUT.npz    # torch -> native
    python scripts/convert_checkpoint.py IN.npz OUT.pt    # native -> torch

The .npz layout flattens the Flax param pytree with '/'-joined keys. The .pt
export writes the reference key schema (SURVEY.md §2.5) loadable by the
reference's `load_state_dict` after its `_orig_mod.` strip — i.e. checkpoints
are exchangeable in both directions.
"""

from __future__ import annotations

import argparse
import sys


sys.path.insert(0, __file__.rsplit("/", 2)[0])

from fast_srgan_tpu.checkpoints.npz_io import load_npz_params, save_npz_params  # noqa: E402
from fast_srgan_tpu.checkpoints.torch_compat import (  # noqa: E402
    generator_params_to_torch_state_dict,
    load_reference_generator_params,
)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("src")
    parser.add_argument("dst")
    args = parser.parse_args()

    if args.src.endswith(".pt") and args.dst.endswith(".npz"):
        save_npz_params(args.dst, load_reference_generator_params(args.src))
        print(f"Wrote native checkpoint: {args.dst}")
    elif args.src.endswith(".npz") and args.dst.endswith(".pt"):
        import torch

        sd = generator_params_to_torch_state_dict(load_npz_params(args.src))
        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, args.dst)
        print(f"Wrote reference-format checkpoint: {args.dst}")
    else:
        raise SystemExit("expected IN.pt OUT.npz or IN.npz OUT.pt")


if __name__ == "__main__":
    main()
