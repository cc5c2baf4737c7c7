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


def instance_norm_masked_nhwc(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    count: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Instance norm over the valid region of a zero-padded frame.

    ``mask`` is 1 on valid pixels, 0 on padding, shape [B, H, W, 1];
    ``count`` = valid pixels per sample, [B, 1, 1, 1] fp32. Statistics are
    computed over the masked input and divide by ``count`` — identical to
    computing them on the unpadded frame (a preceding conv smears nonzero
    values into a 1-px pad margin, so the mask inside the sums is load-
    bearing) — and the output is re-masked so padding stays exactly zero
    for the next convolution (zero padding there reproduces the conv
    zero-pad semantics of the true image edge). This is what makes bucketed
    ("pad to a shape grid") inference *exact* rather than approximate: see
    inference.py and tests/test_masked.py.
    """
    x32 = x.astype(jnp.float32) * mask
    s1 = jnp.sum(x32, axis=(1, 2), keepdims=True)
    s2 = jnp.sum(jnp.square(x32), axis=(1, 2), keepdims=True)
    mean = s1 / count
    var = jnp.maximum(s2 / count - jnp.square(mean), 0.0)
    y = (x32 - mean) * lax.rsqrt(var + eps) * mask
    return y.astype(x.dtype)


def valid_mask_nhwc(
    h: int, w: int, valid_h: jnp.ndarray, valid_w: jnp.ndarray
) -> tuple:
    """Build ([B,H,W,1] fp32 mask, [B,1,1,1] fp32 count) from per-sample
    valid sizes (int32 [B]) for a padded frame of static shape (h, w)."""
    b = valid_h.shape[0]
    iy = lax.broadcasted_iota(jnp.int32, (b, h, w, 1), 1)
    ix = lax.broadcasted_iota(jnp.int32, (b, h, w, 1), 2)
    vh = valid_h.reshape(b, 1, 1, 1)
    vw = valid_w.reshape(b, 1, 1, 1)
    mask = ((iy < vh) & (ix < vw)).astype(jnp.float32)
    count = (vh * vw).astype(jnp.float32)
    return mask, count
