#!/usr/bin/env python
"""Fetch + verify the ImageNet VGG19 weights the GAN phase needs.

The reference lets torchvision auto-download `vgg19-dcbb9e9d.pth` at model
construction (reference model.py:8). This environment-independent helper
does the same job explicitly for deployments of this framework:

    python scripts/fetch_vgg.py [--out models/vgg19-dcbb9e9d.pth]

then train with  training.vgg_weights=models/vgg19-dcbb9e9d.pth.

* Downloads from the official torchvision URL (stdlib urllib — no
  torchvision dependency).
* Verifies the torchvision content hash: the 8-hex infix `dcbb9e9d` in the
  canonical filename IS the SHA256 prefix of the file (torchvision's
  `load_state_dict_from_url` check_hash contract), so corruption or a
  wrong file fails loudly.
* Validates the state_dict structurally with the same converter used at
  training startup (key map + cfg-'E' shapes) before declaring success.
* Air-gapped hosts: download the URL elsewhere, copy the file in, and run
  this script with --verify-only to check it.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

URL = "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth"
SHA256_PREFIX = "dcbb9e9d"


def sha256_prefix(path: str, n: int = 8) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:n]


def verify(path: str) -> None:
    got = sha256_prefix(path)
    if got != SHA256_PREFIX:
        raise SystemExit(
            f"{path}: SHA256 prefix {got} != expected {SHA256_PREFIX} — "
            "not the torchvision vgg19-dcbb9e9d.pth file"
        )
    # structural validation through the training-startup converter
    from fast_srgan_tpu.checkpoints.torch_compat import (
        load_torch_state_dict,
        vgg19_params_from_torch_state_dict,
    )

    params = vgg19_params_from_torch_state_dict(load_torch_state_dict(path))
    n = sum(p.size for p in _leaves(params))
    print(f"{path}: hash ok, converter ok ({n:,} parameters)")


def _leaves(tree):
    if hasattr(tree, "values"):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="models/vgg19-dcbb9e9d.pth")
    ap.add_argument("--verify-only", action="store_true",
                    help="only check an existing file (air-gapped flow)")
    args = ap.parse_args()

    if args.verify_only or os.path.exists(args.out):
        if not os.path.exists(args.out):
            raise SystemExit(f"{args.out} does not exist")
        verify(args.out)
        print(f"ready: training.vgg_weights={args.out}")
        return

    import urllib.request

    print(f"downloading {URL} -> {args.out}")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    tmp = args.out + ".part"
    try:
        urllib.request.urlretrieve(URL, tmp)  # noqa: S310 (https, fixed host)
    except Exception as e:
        raise SystemExit(
            f"download failed ({e}). On an air-gapped host: fetch {URL} "
            f"elsewhere, copy it to {args.out}, and re-run with --verify-only"
        )
    os.replace(tmp, args.out)
    verify(args.out)
    print(f"ready: training.vgg_weights={args.out}")


if __name__ == "__main__":
    main()
