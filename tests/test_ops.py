"""Core-op parity tests against PyTorch (CPU) reference semantics."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fast_srgan_tpu.ops.norm import instance_norm_nhwc
from fast_srgan_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc, pixel_unshuffle_nhwc
from fast_srgan_tpu.ops.resize import bicubic_resize_matrix, resize_bicubic_nhwc


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def to_nhwc(x: torch.Tensor) -> np.ndarray:
    return x.numpy().transpose(0, 2, 3, 1)


class TestPixelShuffle:
    def test_matches_torch(self, rng):
        x = rng.standard_normal((2, 5, 7, 16), dtype=np.float32)
        ours = np.asarray(pixel_shuffle_nhwc(jnp.asarray(x), 2))
        theirs = to_nhwc(F.pixel_shuffle(nchw(x), 2))
        np.testing.assert_array_equal(ours, theirs)

    def test_matches_torch_r3(self, rng):
        x = rng.standard_normal((1, 4, 4, 18), dtype=np.float32)
        ours = np.asarray(pixel_shuffle_nhwc(jnp.asarray(x), 3))
        theirs = to_nhwc(F.pixel_shuffle(nchw(x), 3))
        np.testing.assert_array_equal(ours, theirs)

    def test_unshuffle_roundtrip(self, rng):
        x = rng.standard_normal((2, 6, 8, 12), dtype=np.float32)
        y = pixel_unshuffle_nhwc(pixel_shuffle_nhwc(jnp.asarray(x), 2), 2)
        np.testing.assert_array_equal(np.asarray(y), x)


class TestInstanceNorm:
    def test_matches_torch(self, rng):
        x = rng.standard_normal((3, 9, 11, 8), dtype=np.float32) * 5 + 2
        ours = np.asarray(instance_norm_nhwc(jnp.asarray(x)))
        theirs = to_nhwc(F.instance_norm(nchw(x)))
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_zero_mean_unit_var(self, rng):
        x = rng.standard_normal((2, 16, 16, 4), dtype=np.float32)
        y = np.asarray(instance_norm_nhwc(jnp.asarray(x)))
        np.testing.assert_allclose(y.mean(axis=(1, 2)), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.var(axis=(1, 2)), 1.0, atol=1e-3)


class TestBicubicResize:
    """Parity with torch antialiased bicubic — the training-data contract
    (reference dataloader.py:15-19 and trainer.py:74-76)."""

    @pytest.mark.parametrize("in_size,out_size", [(96, 24), (128, 32), (100, 40)])
    def test_downsample_matches_torch(self, rng, in_size, out_size):
        x = rng.uniform(0, 255, (2, in_size, in_size, 3)).astype(np.float32)
        ours = np.asarray(resize_bicubic_nhwc(jnp.asarray(x), out_size, out_size))
        theirs = to_nhwc(
            F.interpolate(
                nchw(x), size=(out_size, out_size), mode="bicubic",
                antialias=True, align_corners=False,
            )
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-2, rtol=1e-5)

    def test_upsample_matches_torch_antialias(self, rng):
        # The fixed-image "Bicubic" panel path: 4x upsample, antialias=True
        # (reference trainer.py:74-76).
        x = rng.uniform(-1, 1, (2, 24, 24, 3)).astype(np.float32)
        ours = np.asarray(resize_bicubic_nhwc(jnp.asarray(x), 96, 96))
        theirs = to_nhwc(
            F.interpolate(
                nchw(x), scale_factor=4, mode="bicubic", antialias=True,
                align_corners=False,
            )
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_matrix_rows_normalized(self):
        m = bicubic_resize_matrix(96, 24)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)

    def test_identity_when_same_size(self, rng):
        x = rng.standard_normal((1, 24, 24, 3), dtype=np.float32)
        y = np.asarray(resize_bicubic_nhwc(jnp.asarray(x), 24, 24))
        np.testing.assert_array_equal(y, x)


class TestBicubicResizeNonAA:
    """Plain (antialias=False) bicubic vs torch: borders use CLAMPED source
    indices (replicate), not the AA path's drop-and-renormalize."""

    @pytest.mark.parametrize("h,w,oh,ow", [(16, 20, 64, 80), (33, 17, 66, 34)])
    def test_matches_torch_plain_bicubic(self, rng, h, w, oh, ow):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from fast_srgan_tpu.ops.resize import resize_bicubic_nhwc

        x = rng.uniform(0, 255, (2, h, w, 3)).astype(np.float32)
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(t, size=(oh, ow), mode="bicubic", antialias=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        got = np.asarray(
            resize_bicubic_nhwc(jnp.asarray(x), oh, ow, antialias=False)
        )
        np.testing.assert_allclose(got, ref, atol=1e-3)
