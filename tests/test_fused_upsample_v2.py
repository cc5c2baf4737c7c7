"""v2 (multi-row blocked) fused upsample kernel: interpreter exactness."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from fast_srgan_tpu.kernels.fused_upsample import (
    _fused_pallas_v2,
    _reference_impl,
    build_packed_weights,
)
from fast_srgan_tpu.kernels.pixel_shuffle import phase_major_permutation


@pytest.mark.parametrize("shape,R", [((1, 8, 16, 64), 4), ((2, 16, 24, 64), 8)])
def test_v2_interpreter_matches_lax(rng, shape, R):
    K = rng.standard_normal((3, 3, 64, 256)).astype(np.float32) * 0.05
    bias = rng.standard_normal((256,)).astype(np.float32) * 0.01
    alpha = jnp.asarray([0.25], jnp.float32)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    wt = jnp.asarray(build_packed_weights(K))
    perm = phase_major_permutation(256)
    bias_pm = np.asarray(bias)[perm]
    bias2 = jnp.asarray(np.concatenate([bias_pm, bias_pm]).reshape(1, 512))
    with pltpu.force_tpu_interpret_mode():
        ours = _fused_pallas_v2(x, wt, bias2, alpha, R=R)
    ref = _reference_impl(x, jnp.asarray(K), jnp.asarray(bias), alpha)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("shape,R", [((1, 8, 16, 64), 4)])
def test_v3_interpreter_matches_lax(rng, shape, R):
    from fast_srgan_tpu.kernels.fused_upsample import _fused_pallas_v3

    K = rng.standard_normal((3, 3, 64, 256)).astype(np.float32) * 0.05
    bias = rng.standard_normal((256,)).astype(np.float32) * 0.01
    alpha = jnp.asarray([0.25], jnp.float32)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    wt = jnp.asarray(build_packed_weights(K))
    perm = phase_major_permutation(256)
    bias_pm = np.asarray(bias)[perm]
    bias2 = jnp.asarray(np.concatenate([bias_pm, bias_pm]).reshape(1, 512))
    with pltpu.force_tpu_interpret_mode():
        ours = _fused_pallas_v3(x, wt, bias2, alpha, R=R)
    ref = _reference_impl(x, jnp.asarray(K), jnp.asarray(bias), alpha)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)
