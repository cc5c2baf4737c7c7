"""Fused conv+shuffle+PReLU kernel: interpreter exactness vs lax contract."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from fast_srgan_tpu.kernels.fused_upsample import (
    _fused_pallas,
    _reference_impl,
    build_packed_weights,
    fused_upsample,
)
from fast_srgan_tpu.kernels.pixel_shuffle import phase_major_permutation


def run_fused_interpret(x, K, bias, alpha):
    wt = jnp.asarray(build_packed_weights(K))
    perm = phase_major_permutation(K.shape[-1])
    bias_pm = np.asarray(bias)[perm]
    bias2 = jnp.asarray(
        np.concatenate([bias_pm, bias_pm]).reshape(1, 2 * K.shape[-1])
    )
    with pltpu.force_tpu_interpret_mode():
        return _fused_pallas(x, wt, bias2, alpha)


class TestFusedUpsample:
    @pytest.mark.parametrize("shape", [(1, 5, 16, 64), (2, 8, 24, 64)])
    def test_interpreter_matches_lax(self, rng, shape):
        K = rng.standard_normal((3, 3, 64, 256)).astype(np.float32) * 0.05
        bias = rng.standard_normal((256,)).astype(np.float32) * 0.01
        alpha = jnp.asarray([0.25], jnp.float32)
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        ours = run_fused_interpret(x, K, bias, alpha)
        ref = _reference_impl(x, jnp.asarray(K), jnp.asarray(bias), alpha)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=1e-5
        )

    def test_packed_weights_cover_all_taps(self, rng):
        K = rng.standard_normal((3, 3, 64, 256)).astype(np.float32)
        wt = build_packed_weights(K)
        # Every original tap value must appear; total nonzero blocks = 6 per
        # dy (1 + 4 + 1 over the r,q,s combinations).
        assert wt.shape == (3, 3, 128, 512)
        nonzero_blocks = 0
        for dy in range(3):
            for r in range(3):
                for q in range(2):
                    for s in range(2):
                        block = wt[dy, r, q * 64 : (q + 1) * 64,
                                   s * 256 : (s + 1) * 256]
                        if np.abs(block).max() > 0:
                            nonzero_blocks += 1
        assert nonzero_blocks == 3 * 6

    def test_public_op_falls_back_off_tpu(self, rng):
        K = jnp.asarray(rng.standard_normal((3, 3, 64, 256)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal((256,)).astype(np.float32))
        alpha = jnp.asarray([0.25], jnp.float32)
        x = jnp.asarray(rng.standard_normal((1, 6, 8, 64)).astype(np.float32))
        out = fused_upsample(x, K, bias, alpha)
        ref = _reference_impl(x, K, bias, alpha)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestGeneratorFusedFlag:
    def test_param_tree_interchangeable_and_grad_flows(self, rng):
        import jax
        from fast_srgan_tpu.models import Generator

        x = jnp.asarray(rng.uniform(-1, 1, (1, 12, 12, 3)).astype(np.float32))
        plain = Generator(n_filters=8, n_layers=2)
        fused = Generator(n_filters=8, n_layers=2, fused_upsample=True)
        params = plain.init(jax.random.key(0), x)
        a = plain.apply(params, x)
        b = fused.apply(params, x)  # CPU -> lax fallback, must be identical
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        g = jax.grad(lambda p: float(0) + jnp.sum(jnp.square(fused.apply(p, x))))(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
