"""Model structure tests: golden param counts, shapes, dtype policy."""

import jax
import jax.numpy as jnp
import numpy as np

from fast_srgan_tpu.models import Discriminator, Generator, VGG19Features


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


class TestGenerator:
    def test_param_count_golden(self):
        # 925,646 params at defaults — matches the reference checkpoint
        # (SURVEY.md §2.1; reference model.py:72-117). eval_shape: the
        # golden needs shapes only, no XLA compile.
        model = Generator(n_filters=64, n_layers=8)
        params = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 24, 24, 3))
        )
        assert param_count(params) == 925_646

    def test_output_shape_and_range(self):
        model = Generator()
        x = jnp.zeros((2, 24, 24, 3))
        params = model.init(jax.random.key(0), x)
        y = model.apply(params, jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 24, 24, 3)), jnp.float32))
        assert y.shape == (2, 96, 96, 3)
        assert y.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh head

    def test_fully_convolutional(self):
        # Arbitrary input sizes (reference inference.py:48-53 relies on this).
        model = Generator(n_filters=8, n_layers=2)
        params = model.init(jax.random.key(0), jnp.zeros((1, 24, 24, 3)))
        y = model.apply(params, jnp.zeros((1, 17, 31, 3)))
        assert y.shape == (1, 68, 124, 3)

    def test_bf16_compute_fp32_params(self):
        model = Generator(n_filters=16, n_layers=2, dtype=jnp.bfloat16)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        for leaf in jax.tree.leaves(params):
            assert leaf.dtype == jnp.float32
        y = model.apply(params, jnp.zeros((1, 8, 8, 3)))
        assert y.dtype == jnp.float32  # output cast back after tanh


class TestDiscriminator:
    def test_param_count_golden(self):
        # 4,684,033 params at defaults (SURVEY.md §2.1; model.py:139-193).
        # eval_shape: shapes only, no XLA compile.
        model = Discriminator(n_filters=64)
        params = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 96, 96, 3))
        )
        assert param_count(params) == 4_684_033

    def test_patch_logits_16x(self):
        # 96x96 -> 6x6 single-channel logit map (SURVEY.md §2.1).
        # Shape-contract test: eval_shape traces without compiling.
        model = Discriminator(n_filters=64)
        x = jnp.zeros((2, 96, 96, 3))
        params = jax.eval_shape(model.init, jax.random.key(0), x)
        y = jax.eval_shape(model.apply, params, x)
        assert y.shape == (2, 6, 6, 1)

    def test_odd_sizes_match_torch_conv_arithmetic(self):
        # floor((H + 2 - 3)/2) + 1 per stride-2 conv, 4 of them.
        model = Discriminator(n_filters=8)
        x = jnp.zeros((1, 97, 97, 3))
        params = model.init(jax.random.key(0), x)
        y = model.apply(params, x)
        # 97 -> 49 -> 25 -> 13 -> 7
        assert y.shape == (1, 7, 7, 1)


class TestVGG19:
    def test_feature_shape(self):
        # features[:34] => 512 channels at 1/16 resolution (model.py:8).
        # Shape-contract test: eval_shape traces without compiling.
        model = VGG19Features()
        x = jnp.zeros((1, 96, 96, 3))
        params = jax.eval_shape(model.init, jax.random.key(0), x)
        y = jax.eval_shape(model.apply, params, x)
        assert y.shape == (1, 6, 6, 512)

    def test_conv_count(self):
        # 15 convs retained by features[:34]: 2+2+4+4+3 (cfg E truncated at
        # relu(conv5_3), torchvision index 33).
        model = VGG19Features()
        params = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 32, 32, 3))
        )
        convs = [k for k in params["params"] if k.startswith("conv_")]
        assert len(convs) == 15
