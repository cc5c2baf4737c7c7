"""Optimizer-state interop: optax AdamW <-> torch AdamW state_dict."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fast_srgan_tpu.checkpoints.torch_compat import (
    discriminator_optimizer_from_torch_state_dict,
    discriminator_optimizer_to_torch_state_dict,
    discriminator_torch_param_order,
    generator_optimizer_from_torch_state_dict,
    generator_optimizer_to_torch_state_dict,
    generator_torch_param_order,
)
from fast_srgan_tpu.models import Discriminator, Generator
from fast_srgan_tpu.train.steps import make_optimizer


def stepped_state(model, example, n_steps=2):
    params = model.init(jax.random.key(0), example)
    tx = make_optimizer(1e-4)
    state = tx.init(params)
    for k in range(n_steps):
        grads = jax.tree.map(
            lambda p: jnp.full_like(p, 0.01 * (k + 1)), params
        )
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return params, state, tx


class TestGeneratorOptimizerInterop:
    def test_roundtrip_identity(self):
        model = Generator(n_filters=8, n_layers=2)
        _, state, _ = stepped_state(model, jnp.zeros((1, 8, 8, 3)))
        sd = generator_optimizer_to_torch_state_dict(state, n_layers=2)
        back = generator_optimizer_from_torch_state_dict(sd, state, n_layers=2)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_torch_accepts_exported_state(self):
        # Build torch parameters with the reference's exact shapes/order and
        # check torch.optim.AdamW.load_state_dict takes our export verbatim.
        model = Generator(n_filters=8, n_layers=2)
        params, state, _ = stepped_state(model, jnp.zeros((1, 8, 8, 3)))
        sd = generator_optimizer_to_torch_state_dict(state, n_layers=2)
        from fast_srgan_tpu.checkpoints.torch_compat import (
            generator_params_to_torch_state_dict,
        )
        weight_sd = generator_params_to_torch_state_dict(params)
        order = generator_torch_param_order(2)
        torch_params = [
            torch.nn.Parameter(torch.from_numpy(np.ascontiguousarray(weight_sd[k]).copy()))
            for k in order
        ]
        opt = torch.optim.AdamW(torch_params, lr=1e-4)
        sd_t = {
            "state": {
                i: {
                    k2: torch.as_tensor(
                        v2.copy() if isinstance(v2, np.ndarray) else v2
                    )
                    for k2, v2 in s.items()
                }
                for i, s in sd["state"].items()
            },
            "param_groups": sd["param_groups"],
        }
        opt.load_state_dict(sd_t)  # must not raise
        assert float(opt.state_dict()["state"][0]["step"]) == 2.0
        # The export must not pin an implementation choice: torch adopts the
        # checkpoint's param_groups verbatim on load, and fused=True would
        # force the fused kernel on backends that lack it. fused=None lets
        # torch pick per-device — and the adopted group must actually step.
        assert opt.param_groups[0]["fused"] is None
        for p in torch_params:
            p.grad = torch.full_like(p, 1e-3)
        opt.step()  # must not raise on a backend without the fused kernel


class TestDiscriminatorOptimizerInterop:
    def test_roundtrip_identity(self):
        model = Discriminator(n_filters=8)
        _, state, _ = stepped_state(model, jnp.zeros((1, 32, 32, 3)))
        sd = discriminator_optimizer_to_torch_state_dict(state)
        assert len(sd["state"]) == len(discriminator_torch_param_order())
        back = discriminator_optimizer_from_torch_state_dict(sd, state)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
