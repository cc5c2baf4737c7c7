"""PSNR / SSIM matching the reference's torchmetrics protocol.

The reference validates with torchmetrics
``PeakSignalNoiseRatio(data_range=1.0)`` and
``StructuralSimilarityIndexMeasure(data_range=1.0)`` over [0,1]-mapped images
(/root/reference/trainer.py:46-51,53-69). Semantics reproduced here:

  * PSNR, dim=None: torchmetrics accumulates sum-of-squared-error and element
    count across ``update`` calls and computes one aggregate
    ``10*log10(data_range^2 / (sse/n))`` over the whole dataset.
  * SSIM: per-image gaussian SSIM — 11x11 kernel, sigma 1.5, k1=0.01,
    k2=0.03, channel-averaged, mean over the *valid* (unpadded) response map
    — then the dataset mean of per-image values
    (reference: reduction="none" then ``.compute().mean()``).

Everything is jittable and runs on device; the host only accumulates two
scalars per batch. SSIM's separable gaussian filtering is expressed as two
small matmul-like convs that XLA maps onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _filter2d_valid(x: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable 'valid' gaussian filter on [B, H, W, C]."""
    # filter along H: einsum over sliding windows via conv
    b, h, w, c = x.shape
    n = k1d.shape[0]
    kh = k1d.reshape(n, 1, 1, 1)  # HWIO depthwise-style
    kw = k1d.reshape(1, n, 1, 1)
    # HIGHEST: at default precision TPU fp32 convs run bf16-decomposed;
    # the E[x^2]-E[x]^2 variance terms downstream would amplify the ~1e-3
    # mu errors to the order of c2, breaking torchmetrics comparability.
    hp = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kh, (1, 1, 1, c)),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=hp,
    )
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kw, (1, 1, 1, c)),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=hp,
    )
    return x


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim_per_image(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Per-image SSIM of [B, H, W, C] pairs -> [B]."""
    if pred.shape[1] < 11 or pred.shape[2] < 11:
        raise ValueError(
            f"SSIM needs images >= 11x11 (gaussian kernel size); got "
            f"{pred.shape[1]}x{pred.shape[2]}"
        )
    kernel = jnp.asarray(_gaussian_kernel1d())
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)

    mu_x = _filter2d_valid(x, kernel)
    mu_y = _filter2d_valid(y, kernel)
    mu_xx = _filter2d_valid(x * x, kernel)
    mu_yy = _filter2d_valid(y * y, kernel)
    mu_xy = _filter2d_valid(x * y, kernel)

    # E[x^2] - E[x]^2 cancels catastrophically in fp32 once sr ~= hr (a
    # well-trained model!): variances go slightly negative and SSIM leaves
    # [-1, 1] (observed: per-dataset means of 1.01 and -0.07). Clamp the
    # variances at 0 and cap the covariance by Cauchy-Schwarz, which
    # restores the mathematical SSIM <= 1 guarantee.
    sigma_x = jnp.maximum(mu_xx - mu_x * mu_x, 0.0)
    sigma_y = jnp.maximum(mu_yy - mu_y * mu_y, 0.0)
    sigma_xy = mu_xy - mu_x * mu_y
    cs_bound = jnp.sqrt(sigma_x * sigma_y)
    sigma_xy = jnp.clip(sigma_xy, -cs_bound, cs_bound)

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    ssim_map = num / den
    return jnp.mean(ssim_map, axis=(1, 2, 3))


@jax.jit
def luma_bt601(x01: jnp.ndarray) -> jnp.ndarray:
    """Matlab-convention luma of [B, H, W, 3] RGB in [0, 1] -> [B, H, W, 1].

    The SR literature's benchmark protocol (Set5/Set14/BSD100/DIV2K tables
    in the SRGAN/ESRGAN papers) reports PSNR/SSIM on the Y channel of
    matlab ``rgb2ycbcr`` — ITU-R BT.601 studio swing:

        Y = (16 + 65.481 R + 128.553 G + 24.966 B) / 255,  RGB in [0, 1]

    so published numbers can be reproduced with ``evaluate.py
    --y_channel``. The reference itself computes RGB-domain metrics only
    (trainer.py:53-69); this is the conversion it lacks.
    """
    if x01.shape[-1] != 3:
        raise ValueError(f"expected RGB last dim 3, got {x01.shape}")
    w = jnp.asarray([65.481, 128.553, 24.966], x01.dtype) / 255.0
    y = jnp.tensordot(x01, w, axes=[[-1], [0]]) + 16.0 / 255.0
    return y[..., None]


def psnr_accumulate(pred: jnp.ndarray, target: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-batch (sum_squared_error, element_count) for aggregate PSNR."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.sum(diff * diff), jnp.asarray(diff.size, jnp.float32)


def psnr_from_accumulator(sse: float, n: float, data_range: float = 1.0) -> float:
    """Aggregate PSNR (torchmetrics dim=None semantics)."""
    if n <= 0:
        # an empty pass must not report PSNR=inf as if it were a perfect
        # score (torchmetrics likewise errors on compute-without-update)
        raise ValueError("empty PSNR accumulator: no pixels were measured")
    mse = sse / n
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


class MetricAggregator:
    """Accumulates PSNR sse/count and per-image SSIM over a dataset pass
    (the reference's `_calculate_metrics_over_dataset`, trainer.py:53-69)."""

    def __init__(self, data_range: float = 1.0):
        self.data_range = data_range
        self.reset()

    def reset(self) -> None:
        self._sse = 0.0
        self._n = 0.0
        self._ssim_sum = 0.0
        self._images = 0

    def update(self, pred: jnp.ndarray, target: jnp.ndarray) -> None:
        sse, n = psnr_accumulate(pred, target)
        ssim = ssim_per_image(pred, target, data_range=self.data_range)
        self._sse += float(sse)
        self._n += float(n)
        self._ssim_sum += float(jnp.sum(ssim))
        self._images += int(ssim.shape[0])

    def compute(self) -> Tuple[float, float]:
        psnr = psnr_from_accumulator(self._sse, self._n, self.data_range)
        ssim = self._ssim_sum / max(self._images, 1)
        return psnr, ssim
