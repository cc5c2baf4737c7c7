#!/usr/bin/env python
"""Measure jitted train-step throughput on the attached device.

Times the pretrain step and the full GAN step (D update + G update) at the
reference's training shape (batch 24, 24->96 crops — configs/config.yaml)
with device-resident synthetic uint8 HR crops. Steps chain through their
donated states, so fetching the final scalar loss forces the whole sequence
(the axon tunnel's block_until_ready returns early — see bench.py).

Usage: python scripts/train_throughput.py [STEPS=50] [BATCH=24]
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

from fast_srgan_tpu.config import default_config  # noqa: E402
from fast_srgan_tpu.train.steps import build_bundle  # noqa: E402


def main() -> None:
    steps = int(os.environ.get("STEPS", "50"))
    batch = int(os.environ.get("BATCH", "24"))
    vgg = os.environ.get("VGG", "pixel")  # path, "init" (fixed-seed VGG), or "pixel"
    accum = int(os.environ.get("ACCUM", "1"))
    shared = os.environ.get("SHARED", "1") != "0"  # gan_shared_forward
    remat_vgg = os.environ.get("REMAT_VGG", "0") == "1"
    vgg_concat = os.environ.get("VGG_CONCAT", "0") == "1"

    config = default_config(
        training={
            "bf16": True, "batch_size": batch, "vgg_weights": vgg,
            "grad_accum": accum, "gan_shared_forward": shared,
            "remat_vgg": remat_vgg, "vgg_concat": vgg_concat,
        }
    )
    bundle, g_state, d_state, vgg_params = build_bundle(config)
    hr = config.data.lr_image_size * config.data.scale_factor

    rng = np.random.default_rng(0)
    staged = [
        jax.device_put(rng.integers(0, 256, (batch, hr, hr, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    key = jax.random.key(0)

    # --- pretrain step ---
    g_state, loss = bundle.pretrain_step(g_state, staged[0])
    float(loss)  # compile + completion barrier
    t0 = time.perf_counter()
    for i in range(steps):
        g_state, loss = bundle.pretrain_step(g_state, staged[i % 4])
    float(loss)
    pre_dt = (time.perf_counter() - t0) / steps

    # --- full GAN step ---
    g_state, d_state, metrics = bundle.gan_step(
        g_state, d_state, vgg_params, staged[0], key
    )
    float(metrics["g_loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        key = jax.random.fold_in(key, i)
        g_state, d_state, metrics = bundle.gan_step(
            g_state, d_state, vgg_params, staged[i % 4], key
        )
    float(metrics["g_loss"])
    gan_dt = (time.perf_counter() - t0) / steps

    print(json.dumps({
        "batch": batch,
        "hr_crop": hr,
        "content_loss": "pixel" if vgg == "pixel" else "vgg",
        "variant": {
            "shared": shared, "remat_vgg": remat_vgg,
            "vgg_concat": vgg_concat, "accum": accum,
        },
        "pretrain_steps_per_s": round(1 / pre_dt, 2),
        "pretrain_crops_per_s": round(batch / pre_dt, 1),
        "gan_steps_per_s": round(1 / gan_dt, 2),
        "gan_crops_per_s": round(batch / gan_dt, 1),
        "ms_per_step": {
            "pretrain": round(pre_dt * 1000, 2),
            "gan": round(gan_dt * 1000, 2),
        },
    }))


if __name__ == "__main__":
    main()
