"""Loss functions with the reference's exact torch semantics.

The reference uses ``torch.nn.SmoothL1Loss()`` (content/pixel loss) and
``torch.nn.BCEWithLogitsLoss()`` (adversarial loss) with default parameters
(/root/reference/trainer.py:40-43). Defaults reproduced: SmoothL1 beta=1.0,
mean reduction; BCE-with-logits mean reduction with the numerically stable
log-sum-exp form.
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0
) -> jnp.ndarray:
    """Huber-style smooth L1, mean reduction (torch SmoothL1Loss defaults)."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    abs_diff = jnp.abs(diff)
    loss = jnp.where(
        abs_diff < beta, 0.5 * diff * diff / beta, abs_diff - 0.5 * beta
    )
    return jnp.mean(loss)


def bce_with_logits_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid cross-entropy from logits, mean reduction, stable form:
    max(x,0) - x*z + log1p(exp(-|x|)) (the torch BCEWithLogitsLoss kernel)."""
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    loss = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss)
