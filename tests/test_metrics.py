"""Metric tests against an independent numpy oracle (no torchmetrics in env)."""

import jax.numpy as jnp
import numpy as np

from fast_srgan_tpu.metrics.psnr_ssim import (
    MetricAggregator,
    psnr_accumulate,
    psnr_from_accumulator,
    ssim_per_image,
)


def numpy_ssim(a: np.ndarray, b: np.ndarray, data_range=1.0, k1=0.01, k2=0.03):
    """Independent SSIM oracle: gaussian 11x11 sigma 1.5, valid region,
    channel-averaged — the torchmetrics/original-paper protocol."""
    x = np.arange(11, dtype=np.float64) - 5
    g = np.exp(-0.5 * (x / 1.5) ** 2)
    g /= g.sum()

    def filt(img):  # img [H, W]
        tmp = np.apply_along_axis(lambda r: np.convolve(r, g, "valid"), 1, img)
        return np.apply_along_axis(lambda c: np.convolve(c, g, "valid"), 0, tmp)

    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    vals = []
    for ch in range(a.shape[2]):
        xa, xb = a[:, :, ch].astype(np.float64), b[:, :, ch].astype(np.float64)
        mu_a, mu_b = filt(xa), filt(xb)
        saa = filt(xa * xa) - mu_a**2
        sbb = filt(xb * xb) - mu_b**2
        sab = filt(xa * xb) - mu_a * mu_b
        m = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
            (mu_a**2 + mu_b**2 + c1) * (saa + sbb + c2)
        )
        vals.append(m.mean())
    return float(np.mean(vals))


class TestSSIM:
    def test_matches_numpy_oracle(self, rng):
        a = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)
        ours = np.asarray(ssim_per_image(jnp.asarray(a), jnp.asarray(b)))
        for i in range(2):
            oracle = numpy_ssim(a[i], b[i])
            np.testing.assert_allclose(ours[i], oracle, atol=1e-5)

    def test_identical_images_give_one(self, rng):
        a = rng.uniform(0, 1, (1, 24, 24, 3)).astype(np.float32)
        s = float(ssim_per_image(jnp.asarray(a), jnp.asarray(a))[0])
        assert abs(s - 1.0) < 1e-6

    def test_near_identical_low_variance_stays_in_range(self, rng):
        # The fp32 cancellation regime that produced SSIM=1.011 and -0.07 in
        # a real training run: smooth images, sr within ~1e-3 of hr.
        yy, xx = np.mgrid[0:32, 0:32]
        hr = (0.4 + 0.2 * (yy + xx) / 64).astype(np.float32)
        hr = np.stack([hr] * 3, -1)[None]
        sr = (hr + rng.normal(0, 1e-3, hr.shape)).astype(np.float32)
        s = float(ssim_per_image(jnp.asarray(sr), jnp.asarray(hr))[0])
        assert 0.9 <= s <= 1.0, s

    def test_uncorrelated_far_from_one(self, rng):
        a = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        b = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        assert float(ssim_per_image(jnp.asarray(a), jnp.asarray(b))[0]) < 0.3


class TestPSNR:
    def test_aggregate_matches_closed_form(self, rng):
        a = rng.uniform(0, 1, (3, 16, 16, 3)).astype(np.float32)
        b = np.clip(a + 0.1, 0, 1).astype(np.float32)
        sse, n = psnr_accumulate(jnp.asarray(a), jnp.asarray(b))
        got = psnr_from_accumulator(float(sse), float(n))
        mse = np.mean((a - b) ** 2)
        np.testing.assert_allclose(got, 10 * np.log10(1.0 / mse), rtol=1e-5)

    def test_dataset_semantics_pool_sse_not_psnr(self, rng):
        # torchmetrics dim=None pools SSE over updates (NOT mean of per-batch
        # PSNRs) — the aggregator must reproduce that.
        a1 = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
        a2 = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
        b1 = np.clip(a1 + 0.05, 0, 1).astype(np.float32)
        b2 = np.clip(a2 + 0.2, 0, 1).astype(np.float32)
        agg = MetricAggregator()
        agg.update(jnp.asarray(b1), jnp.asarray(a1))
        agg.update(jnp.asarray(b2), jnp.asarray(a2))
        psnr, ssim = agg.compute()
        mse = (np.sum((a1 - b1) ** 2) + np.sum((a2 - b2) ** 2)) / (a1.size + a2.size)
        np.testing.assert_allclose(psnr, 10 * np.log10(1.0 / mse), rtol=1e-5)
        assert -1.0 <= ssim <= 1.0


class TestLumaBT601:
    """Matlab rgb2ycbcr Y-channel convention (evaluate.py --y_channel)."""

    def test_known_values(self):
        from fast_srgan_tpu.metrics.psnr_ssim import luma_bt601

        x = np.array(
            [[[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]]], np.float32
        )  # white, black
        y = np.asarray(luma_bt601(jnp.asarray(x)))
        assert y.shape == (1, 1, 2, 1)
        np.testing.assert_allclose(y[0, 0, 0, 0], 235.0 / 255.0, atol=1e-6)
        np.testing.assert_allclose(y[0, 0, 1, 0], 16.0 / 255.0, atol=1e-6)

    def test_matches_numpy_oracle(self, rng):
        from fast_srgan_tpu.metrics.psnr_ssim import luma_bt601

        x = rng.uniform(0, 1, (2, 7, 5, 3)).astype(np.float32)
        want = (
            16.0
            + 65.481 * x[..., 0]
            + 128.553 * x[..., 1]
            + 24.966 * x[..., 2]
        ) / 255.0
        got = np.asarray(luma_bt601(jnp.asarray(x)))[..., 0]
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rejects_non_rgb(self):
        import pytest

        from fast_srgan_tpu.metrics.psnr_ssim import luma_bt601

        with pytest.raises(ValueError):
            luma_bt601(jnp.zeros((1, 4, 4, 1)))
