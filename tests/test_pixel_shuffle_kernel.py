"""DMA pixel-shuffle kernel: interpreter-mode exactness + permutation algebra."""

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from fast_srgan_tpu.kernels.pixel_shuffle import (
    fast_pixel_shuffle_from_torch_order,
    phase_major_permutation,
    pixel_shuffle_phase_major_dma,
)
from fast_srgan_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc


class TestPhaseMajorDma:
    def test_interpreter_exact(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 5, 7, 256)).astype(np.float32))
        perm = jnp.asarray(phase_major_permutation(256))
        with pltpu.force_tpu_interpret_mode():
            ours = pixel_shuffle_phase_major_dma(x[..., perm])
        np.testing.assert_array_equal(
            np.asarray(ours), np.asarray(pixel_shuffle_nhwc(x, 2))
        )

    def test_permutation_is_bijection(self):
        perm = phase_major_permutation(256)
        assert sorted(perm) == list(range(256))

    def test_wrapper_falls_back_off_tpu(self, rng):
        # On CPU the public wrapper must use the jnp composition.
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 256)).astype(np.float32))
        out = fast_pixel_shuffle_from_torch_order(x)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(pixel_shuffle_nhwc(x, 2))
        )
