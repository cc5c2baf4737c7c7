"""Device-side dihedral data augmentation for square HR crops.

The reference trains with random crops only — no flips or rotations
(reference dataloader.py:24-38; SURVEY.md §2.2 "crop is the only
augmentation"). Flip/rotation augmentation is standard SR-training
practice (EDSR/ESRGAN recipes), so the rebuild offers it as an opt-in:
``training.augment=true``. Off by default to preserve the reference
recipe exactly.

TPU-first shape: the augmentation runs *inside* the jitted train step on
the uint8 HR batch, before LR synthesis — so the LR/HR pair stays exactly
consistent (the LR image is the bicubic downsample of the augmented HR),
and the host pipeline is untouched. Per-sample transforms are selected
with ``jnp.where`` over statically-shaped flips/transposes (no
data-dependent control flow); all three ops are pure layout moves that
XLA fuses into the adjacent uint8->float convert, so the augmented step
costs no extra HBM round-trip.

The transform group is the full dihedral group D4 (8 symmetries),
generated per-sample by three independent coin flips: horizontal flip,
vertical flip, transpose. Transpose requires square crops; HR crops are
square by construction (lr_image_size x scale on both axes), but the op
degrades gracefully (flips only) for non-square inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def augment_dihedral(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Per-sample random D4 transform of an NHWC batch.

    Each sample independently draws one of the 8 dihedral symmetries
    (uniformly: 3 fair coin flips generate the group). Identity when all
    three coins land 0, so 1/8 of samples pass through unchanged.

    Works on any dtype (applied to uint8 HR crops in the train steps).
    For non-square H != W inputs the transpose coin is skipped (4
    symmetries), keeping output shape == input shape.
    """
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    coins = jax.random.bernoulli(key, shape=(3, n))
    hflip = coins[0][:, None, None, None]
    vflip = coins[1][:, None, None, None]
    x = jnp.where(hflip, x[:, :, ::-1, :], x)
    x = jnp.where(vflip, x[:, ::-1, :, :], x)
    if h == w:
        x = jnp.where(coins[2][:, None, None, None], jnp.swapaxes(x, 1, 2), x)
    return x
