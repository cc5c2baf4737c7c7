#!/usr/bin/env python
"""Measure the LR-domain tail (ops/lr_tail.py) against the canonical forward.

Same protocol as bench.py (device-resident uint8 batches, int32-checksum
completion barrier — see bench.py's docstring for why), run back-to-back in
one process on identical staged inputs, plus a fidelity check: the two paths
must agree on uint8 outputs (tiny diffs only from bf16 contraction-order
changes).

Usage: python scripts/lr_tail_experiment.py  [BENCH_FRAMES=320 BENCH_BATCH=16]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fast_srgan_tpu.utils import jax_cache  # noqa: E402

jax_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import entry  # noqa: E402
from fast_srgan_tpu.models import Generator  # noqa: E402
from fast_srgan_tpu.ops.lr_tail import generator_apply_lr_tail  # noqa: E402


def run(forward, params, staged, n_batches):
    _, ck = forward(params, staged[0])
    int(ck)  # compile + full-execution barrier
    start = time.perf_counter()
    checksums = []
    for i in range(n_batches):
        _, ck = forward(params, staged[i % len(staged)])
        checksums.append(ck)
        if len(checksums) > 8:
            int(checksums.pop(0))
    for ck in checksums:
        int(ck)
    return time.perf_counter() - start


def main() -> None:
    frames = int(os.environ.get("BENCH_FRAMES", "320"))
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    scale = int(os.environ.get("SCALE", "4"))
    n_batches = (frames + batch - 1) // batch
    h, w = 180, 320

    model = Generator(
        n_filters=64, n_layers=8, dtype=jnp.bfloat16, scale_factor=scale
    )
    if scale == 4:
        _, (params, _) = entry()  # the shipped pretrained checkpoint
    else:
        # timing doesn't depend on weight values; fidelity check still does
        params = model.init(jax.random.key(0), jnp.zeros((1, 24, 24, 3)))
    params = jax.device_put(params)

    def make(apply_fn):
        @jax.jit
        def forward(p, x_u8):
            x = x_u8.astype(jnp.float32) / 127.5 - 1.0
            y = apply_fn(p, x)
            u8 = ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)
            return u8, jnp.sum(u8, dtype=jnp.int32)

        return forward

    fwd_canonical = make(model.apply)
    fwd_lr = make(lambda p, x: generator_apply_lr_tail(model, p, x))

    rng = np.random.default_rng(0)
    staged = [
        jax.device_put(rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8))
        for _ in range(min(n_batches, 8))
    ]

    # Fidelity: mean abs uint8 diff between the two paths on one batch.
    ua, _ = fwd_canonical(params, staged[0])
    ub, _ = fwd_lr(params, staged[0])
    diff = jnp.mean(jnp.abs(ua.astype(jnp.int32) - ub.astype(jnp.int32)))
    mean_abs_diff = float(diff)

    results = {}
    # Interleave orders to cancel any drift: canonical, lr, lr, canonical.
    results["canonical_1"] = run(fwd_canonical, params, staged, n_batches)
    results["lr_tail_1"] = run(fwd_lr, params, staged, n_batches)
    results["lr_tail_2"] = run(fwd_lr, params, staged, n_batches)
    results["canonical_2"] = run(fwd_canonical, params, staged, n_batches)

    fps = {k: n_batches * batch / v for k, v in results.items()}
    can = (fps["canonical_1"] + fps["canonical_2"]) / 2
    lr = (fps["lr_tail_1"] + fps["lr_tail_2"]) / 2
    print(json.dumps({
        "fps": {k: round(v, 1) for k, v in fps.items()},
        "canonical_fps": round(can, 1),
        "lr_tail_fps": round(lr, 1),
        "speedup": round(lr / can, 3),
        "mean_abs_u8_diff": round(mean_abs_diff, 4),
        "ms_per_batch": {
            "canonical": round(1000 * batch / can, 1),
            "lr_tail": round(1000 * batch / lr, 1),
        },
    }))


if __name__ == "__main__":
    main()
