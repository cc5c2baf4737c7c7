"""Training engine: losses, jitted train steps, state, trainer orchestration."""

from fast_srgan_tpu.train.losses import smooth_l1_loss, bce_with_logits_loss

__all__ = ["smooth_l1_loss", "bce_with_logits_loss"]
