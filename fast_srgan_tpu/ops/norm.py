"""Parameterless instance normalization for NHWC activations.

The reference uses ``torch.nn.InstanceNorm2d`` with defaults
(``affine=False, track_running_stats=False`` — /root/reference/model.py:55,65,94,132),
i.e. a stateless per-sample, per-channel spatial standardization with biased
variance and eps=1e-5. The shipped checkpoint confirms there are no norm
parameters (no ``bn*`` keys).

Statistics are computed in fp32 even under bf16 compute: the spatial reduction
is the numerically sensitive part of the generator, and the cast is free on
TPU (the VPU upconverts on read).

The statistics use the one-pass formulation (E[x] and E[x^2] in a single
fused sweep, biased var = E[x^2] - E[x]^2): device profiling showed the
two-pass form costing two full HBM reads per norm — 17 norms made the
statistics sweeps the largest single cost (17.1 ms of a 57 ms batch-16
forward) once the LR-domain tail removed the shuffle copies. The difference
is clamped at 0: fp32 cancellation on near-constant inputs can drive it
slightly negative (the E[x^2]-E[x]^2 hazard class — see metrics/psnr_ssim.py
for the same clamp), and rsqrt(eps) is the correct limit there. IN inputs
are conv outputs with O(1) spread, so the cancellation error is far below
the 2e-5 parity tolerance against the two-pass torch oracle
(tests/test_torch_compat.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def instance_norm_nhwc(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Normalize each (sample, channel) slice over H, W. Parameterless."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    ex2 = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    # Biased variance (torch InstanceNorm semantics), clamped (see above).
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return y.astype(x.dtype)
