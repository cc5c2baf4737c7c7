"""PatchGAN-style critic (TPU-native, NHWC).

Capability parity with the reference discriminator
(/root/reference/model.py:120-193):

  neck: Conv 3->F (k3, p1) + LeakyReLU(0.2)                  (model.py:143-146)
  stem: 7 SimpleBlocks [Conv(k3, p1, stride s, no bias) -> InstanceNorm
        -> LeakyReLU(0.01)] with the channel/stride plan
        F/s2, 2F/s1, 2F/s2, 4F/s1, 4F/s2, 8F/s1, 8F/s2       (model.py:148-183)
  head: Conv 8F->1 (k1) -> patch logit map (no sigmoid)       (model.py:184-186)

Note the reference quirk, preserved for behavioral parity: the neck uses
slope 0.2 but the SimpleBlocks use torch's LeakyReLU *default* slope 0.01.
Depth is hardcoded (the reference reads `discriminator.n_layers` into config
but never uses it). Default config (n_filters=64) has exactly 4,684,033
parameters. Overall downsampling is 16x: a 96x96 crop -> 6x6 logit map.

Explicit (1,1) padding with stride 2 reproduces torch's Conv2d(p=1) output
alignment exactly ('SAME' would pad asymmetrically for even inputs).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from fast_srgan_tpu.ops.norm import instance_norm_nhwc

PAD1 = ((1, 1), (1, 1))


class SimpleBlock(nn.Module):
    """Conv(k3, stride, no bias) -> InstanceNorm -> LeakyReLU(0.01)."""

    n_filters: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.n_filters, (3, 3), strides=(self.stride, self.stride),
            padding=PAD1, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = instance_norm_nhwc(x)
        return nn.leaky_relu(x, negative_slope=0.01)


class Discriminator(nn.Module):
    """Patch critic: [B, H, W, 3] in [-1, 1] -> [B, H/16, W/16, 1] logits."""

    n_filters: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.n_filters
        x = x.astype(self.dtype)
        x = nn.Conv(f, (3, 3), padding=PAD1, dtype=self.dtype, name="neck_conv")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)

        plan = [(f, 2), (2 * f, 1), (2 * f, 2), (4 * f, 1), (4 * f, 2),
                (8 * f, 1), (8 * f, 2)]
        for i, (ch, s) in enumerate(plan):
            x = SimpleBlock(ch, s, dtype=self.dtype, name=f"stem_{i}")(x)

        x = nn.Conv(1, (1, 1), padding="VALID", dtype=self.dtype, name="head_conv")(x)
        return x.astype(jnp.float32)
