"""Scaled-model configs (BASELINE.json config #4) + remat equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from fast_srgan_tpu.config import default_config
from fast_srgan_tpu.models import Generator
from fast_srgan_tpu.train.steps import build_bundle


class TestScaledGenerator:
    def test_12_block_96_filter_forward(self):
        # The BASELINE "scaled generator" config: 12 resblocks / 96 filters.
        model = Generator(n_filters=96, n_layers=12)
        params = model.init(jax.random.key(0), jnp.zeros((1, 24, 24, 3)))
        y = model.apply(params, jnp.zeros((2, 24, 24, 3)))
        assert y.shape == (2, 96, 96, 3)

    def test_remat_is_numerically_identical(self, rng):
        x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
        plain = Generator(n_filters=8, n_layers=2)
        remat = Generator(n_filters=8, n_layers=2, remat=True)
        params = plain.init(jax.random.key(0), x)

        def loss(model, p):
            return jnp.sum(jnp.square(model.apply(p, x)))

        la, ga = jax.value_and_grad(lambda p: loss(plain, p))(params)
        lb, gb = jax.value_and_grad(lambda p: loss(remat, p))(params)
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            # recompute-vs-stored differs only by fp32 reduction order
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4
            )

    def test_scaled_train_step_builds(self, rng):
        config = default_config(
            data={"lr_image_size": 8, "scale_factor": 4},
            generator={"n_filters": 12, "n_layers": 3},
            discriminator={"n_filters": 8},
            training={"bf16": False, "vgg_weights": "pixel", "remat": True},
        )
        bundle, g_state, d_state, vgg_params = build_bundle(config)
        batch = jnp.asarray(
            rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        )
        g_state, d_state, metrics = bundle.gan_step(
            g_state, d_state, vgg_params, batch, jax.random.key(0)
        )
        assert np.isfinite(float(metrics["g_loss"]))
