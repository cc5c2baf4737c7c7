#!/usr/bin/env python
"""Decompose the batch-96 GAN+VGG step: is the 34.5 ms bound structural?

The GAN iteration with the reference's perceptual loss (SmoothL1 on frozen
VGG19 relu5_3 features, reference trainer.py:190-192) measures ~34.4 ms at
batch 96 against a 25.1 ms combined bandwidth roof (docs/DESIGN.md
"Training-step anatomy") — the one row above its roof. Four graph
formulations (shared-forward vjp, recompute, 2B-concat VGG, remat VGG) all
measured 34.4-40.6 ms, so before concluding the gap is a schedule problem
XLA should fix, this experiment prices the VGG term *in isolation*:

  part A: the full GAN iteration WITHOUT the VGG term   (measured: ~20 ms)
  part B: ONLY the VGG content term — f(sr) vs f(hr) SmoothL1, forward +
          grad wrt sr, exactly the subgraph the G update adds — timed as
          its own donated chained program here.

If A + B ~= the measured whole, the combined program's schedule is already
lossless (no overlap left to recover) and the 25.1 ms roofline row is an
underestimate for the *parts as XLA actually runs them*: the bound is
structural — VGG's small-spatial deep tail (6x6x512 maps after 4 pools)
runs below peak on both engines in ANY formulation, which is a property of
the op shapes, not of the step's schedule.

Usage: python scripts/vgg_bound_experiment.py  [STEPS=150 BATCH=96]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fast_srgan_tpu.utils import jax_cache  # noqa: E402

jax_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fast_srgan_tpu.models.vgg import VGG19Features  # noqa: E402
from fast_srgan_tpu.train.losses import smooth_l1_loss  # noqa: E402


def main() -> None:
    steps = int(os.environ.get("STEPS", "150"))
    batch = int(os.environ.get("BATCH", "96"))
    size = 96  # HR crop of the reference recipe (24 * 4)

    vgg = VGG19Features(dtype=jnp.bfloat16)
    params = vgg.init(jax.random.key(7), jnp.zeros((1, size, size, 3)))

    rng = np.random.default_rng(0)
    sr0 = jax.device_put(
        rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
    )
    hr = jax.device_put(
        rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
    )

    # params and hr are TRACED arguments (not closure constants): closing
    # over them would let XLA constant-fold / hoist the loop-invariant
    # VGG(hr) forward out of the timed iteration, understating the term —
    # in the real GAN step hr varies per batch and VGG(hr) runs every step.
    def content(params, sr, hr):
        return smooth_l1_loss(vgg.apply(params, sr), vgg.apply(params, hr))

    grad_fn = jax.value_and_grad(content, argnums=1)

    # --- part B1: VGG content term forward + grad wrt sr (what the GAN
    # step's G update adds on top of the no-VGG iteration). Donated chain
    # (sr is donated, matching the train step's donated state buffers):
    # each iteration's sr depends on the previous grad, so the sequence
    # cannot overlap across steps and the final fetch forces completion
    # (the tunnel's block_until_ready returns early — see bench.py).
    @partial(jax.jit, donate_argnums=(1,))
    def chain_step(params, sr, hr):
        loss, g = grad_fn(params, sr, hr)
        return sr - 1e-3 * g, loss

    sr, loss = chain_step(params, sr0, hr)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        sr, loss = chain_step(params, sr, hr)
    float(loss)
    fwd_bwd_ms = (time.perf_counter() - t0) / steps * 1e3

    # --- part B2: the two VGG forwards alone (no grad) — prices the
    # backward separately.
    @partial(jax.jit, donate_argnums=(1,))
    def fwd_chain(params, sr, hr):
        loss = content(params, sr, hr)
        return sr + (loss * 0).astype(sr.dtype), loss

    sr0 = jax.device_put(
        rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
    )
    sr, loss = fwd_chain(params, sr0, hr)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        sr, loss = fwd_chain(params, sr, hr)
    float(loss)
    fwd_ms = (time.perf_counter() - t0) / steps * 1e3

    print(json.dumps({
        "batch": batch,
        "crop": size,
        "vgg_content_fwd_ms": round(fwd_ms, 2),
        "vgg_content_fwd_bwd_ms": round(fwd_bwd_ms, 2),
        "note": (
            "sum-of-parts check: gan_no_vgg_ms + vgg_content_fwd_bwd_ms "
            "vs the measured GAN+VGG step (docs/DESIGN.md table)"
        ),
    }))


if __name__ == "__main__":
    main()
