"""Property-style sweeps: ops hold their contracts across random shapes."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fast_srgan_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc, pixel_unshuffle_nhwc
from fast_srgan_tpu.ops.resize import resize_bicubic_nhwc


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


class TestPixelShuffleProperties:
    def test_random_shapes_match_torch(self, rng):
        for _ in range(8):
            b = int(rng.integers(1, 4))
            h = int(rng.integers(1, 12))
            w = int(rng.integers(1, 12))
            r = int(rng.choice([2, 3, 4]))
            c = int(rng.integers(1, 5))
            x = rng.standard_normal((b, h, w, c * r * r)).astype(np.float32)
            ours = np.asarray(pixel_shuffle_nhwc(jnp.asarray(x), r))
            theirs = F.pixel_shuffle(nchw(x), r).numpy().transpose(0, 2, 3, 1)
            np.testing.assert_array_equal(ours, theirs)

    def test_shuffle_unshuffle_identity(self, rng):
        for _ in range(5):
            b, h, w, c = 1, int(rng.integers(1, 9)), int(rng.integers(1, 9)), 8
            x = rng.standard_normal((b, h, w, c)).astype(np.float32)
            y = pixel_unshuffle_nhwc(pixel_shuffle_nhwc(jnp.asarray(x), 2), 2)
            np.testing.assert_array_equal(np.asarray(y), x)


class TestResizeProperties:
    @pytest.mark.parametrize("in_size,out_size", [(37, 11), (64, 48), (50, 200)])
    def test_arbitrary_ratios_match_torch(self, rng, in_size, out_size):
        x = rng.uniform(0, 255, (1, in_size, in_size, 3)).astype(np.float32)
        ours = np.asarray(resize_bicubic_nhwc(jnp.asarray(x), out_size, out_size))
        theirs = (
            F.interpolate(
                nchw(x), size=(out_size, out_size), mode="bicubic",
                antialias=True, align_corners=False,
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(ours, theirs, atol=2e-2, rtol=1e-4)

    def test_constant_image_preserved(self):
        x = jnp.full((1, 40, 40, 3), 123.0)
        y = resize_bicubic_nhwc(x, 10, 10)
        np.testing.assert_allclose(np.asarray(y), 123.0, atol=1e-3)
