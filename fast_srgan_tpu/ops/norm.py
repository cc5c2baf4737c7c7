"""Parameterless instance normalization for NHWC activations.

The reference uses ``torch.nn.InstanceNorm2d`` with defaults
(``affine=False, track_running_stats=False`` — /root/reference/model.py:55,65,94,132),
i.e. a stateless per-sample, per-channel spatial standardization with biased
variance and eps=1e-5. The shipped checkpoint confirms there are no norm
parameters (no ``bn*`` keys).

Statistics are computed in fp32 even under bf16 compute: the spatial reduction
is the numerically sensitive part of the generator, and the cast is free on
TPU (the VPU upconverts on read).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def instance_norm_nhwc(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Normalize each (sample, channel) slice over H, W. Parameterless."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    # Biased variance (torch InstanceNorm semantics).
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return y.astype(x.dtype)
