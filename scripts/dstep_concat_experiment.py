#!/usr/bin/env python
"""Experiment: batch the GAN step's two discriminator calls into one.

The reference's D update evaluates the discriminator twice per iteration —
`D(hr)` and `D(sr.detach())` as separate batch-B calls (reference
trainer.py:171-177). Instance norm is per-sample, so

    D(concat([hr, sr], axis=0))  ==  concat([D(hr), D(sr)], axis=0)

exactly, and the whole D forward+backward can run once at batch 2B instead
of twice at batch B — fewer, larger convolutions for the MXU. This script
measures whether XLA actually cares, with the donated-state chaining
protocol of scripts/train_throughput.py (>=100 steps; repeat and take the
best — tunnel timings vary run to run, see docs/DESIGN.md).

Usage: python scripts/dstep_concat_experiment.py [STEPS=120] [BATCH=24]

RESULT (v5e, 2026-08-16, batch 24, 120-step donated chains x3): parity —
best 6.55 ms/step baseline vs 6.47 ms concat (runs 6.71/7.53/6.55 vs
7.20/6.47/6.97; well inside run-to-run spread). The step is HBM-bound
(docs/DESIGN.md "Training-step anatomy") and concatenation moves no bytes
off the critical path; XLA's batch-24 D convs were already MXU-efficient.
The canonical two-call formulation stays (it matches the reference graph
1:1 and keeps per-term loss logging exact).
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

from fast_srgan_tpu.config import default_config  # noqa: E402
from fast_srgan_tpu.train.losses import (  # noqa: E402
    bce_with_logits_loss,
    smooth_l1_loss,
)
from fast_srgan_tpu.train.steps import build_bundle, prepare_batch  # noqa: E402


def main() -> None:
    steps = int(os.environ.get("STEPS", "120"))
    batch = int(os.environ.get("BATCH", "24"))
    repeats = int(os.environ.get("REPEATS", "3"))

    config = default_config(training={"bf16": True, "batch_size": batch, "vgg_weights": "pixel"})
    bundle, g_state0, d_state0, vgg_params = build_bundle(config)
    generator, discriminator = bundle.generator, bundle.discriminator
    lr_size = config.data.lr_image_size
    hr = lr_size * config.data.scale_factor

    # Variant step: identical math to train/steps.py:_gan except the two
    # D-update forwards run as one batch-2B call.
    def _gan_concat(g_state, d_state, hr_u8, rng):
        lr_img, hr_img = prepare_batch(hr_u8, lr_size)
        k_real, k_fake, k_adv = jax.random.split(rng, 3)
        sr_detached = jax.lax.stop_gradient(
            generator.apply(g_state.params, lr_img)
        )

        def d_loss_fn(d_params):
            y = discriminator.apply(
                d_params, jnp.concatenate([hr_img, sr_detached], axis=0)
            )
            y_real, y_fake = jnp.split(y, 2, axis=0)
            real_labels = 0.3 * jax.random.uniform(k_real, y_real.shape) + 0.8
            fake_labels = 0.3 * jax.random.uniform(k_fake, y_fake.shape)
            return 0.5 * bce_with_logits_loss(y_real, real_labels) + (
                0.5 * bce_with_logits_loss(y_fake, fake_labels)
            )

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
        d_state = d_state.apply_gradients(grads=d_grads)

        def g_loss_fn(g_params):
            sr = generator.apply(g_params, lr_img)
            y_fake = discriminator.apply(d_state.params, sr)
            labels = 0.3 * jax.random.uniform(k_adv, y_fake.shape) + 0.7
            adv = 0.1 * bce_with_logits_loss(y_fake, labels)
            content = smooth_l1_loss(sr, hr_img)
            return 0.5 * adv + 0.5 * content

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(g_state.params)
        g_state = g_state.apply_gradients(grads=g_grads)
        return g_state, d_state, g_loss + d_loss

    concat_step = jax.jit(_gan_concat, donate_argnums=(0, 1))

    rng = np.random.default_rng(0)
    staged = [
        jax.device_put(
            rng.integers(0, 256, (batch, hr, hr, 3), dtype=np.uint8)
        )
        for _ in range(4)
    ]

    def fresh_states():
        # donation consumes the passed-in buffers; time each run on copies
        return (
            jax.tree.map(jnp.copy, g_state0),
            jax.tree.map(jnp.copy, d_state0),
        )

    def time_baseline():
        g_state, d_state = fresh_states()
        key = jax.random.key(0)
        g_state, d_state, m = bundle.gan_step(
            g_state, d_state, vgg_params, staged[0], key
        )
        float(m["g_loss"])
        t0 = time.perf_counter()
        for i in range(steps):
            key = jax.random.fold_in(key, i)
            g_state, d_state, m = bundle.gan_step(
                g_state, d_state, vgg_params, staged[i % 4], key
            )
        float(m["g_loss"])
        return (time.perf_counter() - t0) / steps

    def time_concat():
        g_state, d_state = fresh_states()
        key = jax.random.key(0)
        g_state, d_state, loss = concat_step(g_state, d_state, staged[0], key)
        float(loss)
        t0 = time.perf_counter()
        for i in range(steps):
            key = jax.random.fold_in(key, i)
            g_state, d_state, loss = concat_step(
                g_state, d_state, staged[i % 4], key
            )
        float(loss)
        return (time.perf_counter() - t0) / steps

    base_ms, concat_ms = [], []
    for _ in range(repeats):
        base_ms.append(time_baseline() * 1000)
        concat_ms.append(time_concat() * 1000)

    print(json.dumps({
        "batch": batch, "steps": steps,
        "baseline_ms": [round(v, 2) for v in base_ms],
        "concat_ms": [round(v, 2) for v in concat_ms],
        "best_baseline_ms": round(min(base_ms), 2),
        "best_concat_ms": round(min(concat_ms), 2),
    }))


if __name__ == "__main__":
    main()
