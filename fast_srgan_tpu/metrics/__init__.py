"""On-device image-quality metrics (PSNR / SSIM), jittable."""

from fast_srgan_tpu.metrics.psnr_ssim import (
    psnr_accumulate,
    psnr_from_accumulator,
    ssim_per_image,
    MetricAggregator,
)

__all__ = [
    "psnr_accumulate",
    "psnr_from_accumulator",
    "ssim_per_image",
    "MetricAggregator",
]
