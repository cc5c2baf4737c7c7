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

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from fast_srgan_tpu.checkpoints.torch_compat import (  # noqa: E402
    generator_params_to_torch_state_dict,
    load_reference_generator_params,
)


def flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("src")
    parser.add_argument("dst")
    args = parser.parse_args()

    if args.src.endswith(".pt") and args.dst.endswith(".npz"):
        params = load_reference_generator_params(args.src)
        np.savez(args.dst, **flatten(params["params"], "params"))
        print(f"Wrote native checkpoint: {args.dst}")
    elif args.src.endswith(".npz") and args.dst.endswith(".pt"):
        import torch

        params = unflatten(dict(np.load(args.src)))
        sd = generator_params_to_torch_state_dict(params)
        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, args.dst)
        print(f"Wrote reference-format checkpoint: {args.dst}")
    else:
        raise SystemExit("expected IN.pt OUT.npz or IN.npz OUT.pt")


if __name__ == "__main__":
    main()
