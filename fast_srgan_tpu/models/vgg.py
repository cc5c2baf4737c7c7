"""VGG19 perceptual feature extractor (frozen), TPU-native NHWC.

Capability parity with the reference perceptual network
(/root/reference/model.py:5-23): torchvision ``vgg19().features[:34]`` — the
conv stack of configuration 'E' up to and including the ReLU after conv5_3,
producing a 512-channel map at 1/16 resolution. The forward maps inputs from
[-1, 1] to [0, 1] and then ImageNet-normalizes (mean/std buffers), exactly as
the reference does before the conv stack.

Conv plan (torchvision cfg 'E', truncated at features[33]):
  block1: 64, 64, pool | block2: 128, 128, pool
  block3: 256 x4, pool | block4: 512 x4, pool | block5: 512 x3 (no pool)
All convs k3 p1 + ReLU; pools are 2x2 stride-2 max.

ImageNet weights: torchvision is not installed in this environment and there
is no network egress, so weights are loaded from a user-supplied torchvision
``vgg19`` state_dict via :mod:`fast_srgan_tpu.checkpoints.torch_compat`
(config key ``training.vgg_weights``). Without a weights file the extractor
falls back to a fixed-seed He-normal init — the training mechanics (loss
shapes, gradients, jit) are identical, only the perceptual prior differs; the
docstring-level contract is the torchvision key map in torch_compat.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

PAD1 = ((1, 1), (1, 1))

# Channel plan per conv, with 'M' = 2x2/2 max-pool, truncated to features[:34]
# (reference model.py:8 keeps indices 0..33 = up to ReLU(conv5_3)).
VGG19_FEATURES_34_PLAN: Sequence = (
    64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
    512, 512, 512, 512, "M", 512, 512, 512,
)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG19Features(nn.Module):
    """Frozen VGG19 conv features to relu5_3. Input [-1, 1] NHWC RGB."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = (x.astype(jnp.float32) + 1.0) / 2.0
        x = (x - mean) / std
        x = x.astype(self.dtype)

        conv_idx = 0
        for item in VGG19_FEATURES_34_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    item, (3, 3), padding=PAD1, dtype=self.dtype,
                    name=f"conv_{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
        return x.astype(jnp.float32)
