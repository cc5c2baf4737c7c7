"""Discriminator parity vs a torch functional oracle + converter roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fast_srgan_tpu.checkpoints.torch_compat import (
    discriminator_params_from_torch_state_dict,
    discriminator_params_to_torch_state_dict,
)
from fast_srgan_tpu.models import Discriminator


@pytest.fixture(scope="module")
def disc8():
    """Shared module fixture. Params are filled by numpy over the
    eval_shape tree (no XLA compile — Discriminator.init alone costs ~20s
    on CPU); the graph-parity contract holds for any weights, and 8
    filters at 64x64 exercises every conv/stride/norm/slope in the
    reference critic (model.py:120-193)."""
    model = Discriminator(n_filters=8)
    shapes = jax.eval_shape(
        model.init, jax.random.key(1), jnp.zeros((1, 64, 64, 3))
    )
    rng = np.random.default_rng(3)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            0.1 * rng.standard_normal(s.shape).astype(s.dtype)
        ),
        shapes,
    )
    return model, params


def torch_discriminator_forward(sd: dict, x: torch.Tensor) -> torch.Tensor:
    """Oracle executing the reference critic graph (model.py:120-193)."""
    # np.array copy: exported arrays can be non-writable (torch warns)
    w = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
    y = F.conv2d(x, w["neck.0.weight"], w["neck.0.bias"], padding=1)
    y = F.leaky_relu(y, 0.2)
    strides = [2, 1, 2, 1, 2, 1, 2]
    for i, s in enumerate(strides):
        y = F.conv2d(y, w[f"stem.{i}.conv.weight"], None, stride=s, padding=1)
        y = F.instance_norm(y)
        y = F.leaky_relu(y, 0.01)  # torch LeakyReLU default (model.py:133)
    return F.conv2d(y, w["stem.7.weight"], w["stem.7.bias"])


class TestDiscriminatorParity:
    def test_forward_matches_torch(self, disc8, rng):
        model, params = disc8
        sd = discriminator_params_to_torch_state_dict(params)

        x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        ours = np.asarray(model.apply(params, jnp.asarray(x)))
        x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        with torch.no_grad():
            theirs = torch_discriminator_forward(sd, x_t)
        theirs = theirs.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)

    def test_converter_roundtrip(self, disc8):
        _, params = disc8
        sd = discriminator_params_to_torch_state_dict(params)
        back = discriminator_params_from_torch_state_dict(sd)
        flat_a = jax.tree.leaves(params)
        flat_b = jax.tree.leaves(back)
        assert len(flat_a) == len(flat_b) == 11
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
