"""Test harness: force an 8-device virtual CPU mesh.

JAX backends initialize lazily, so even though the environment's
sitecustomize pre-imports JAX configured for the axon TPU backend, we can
still steer the platform to CPU with 8 virtual host devices — the standard
JAX fake-backend configuration for multi-device tests (SURVEY.md §4) — as
long as this runs before the first device access. conftest.py is imported
before any test module, which guarantees that ordering under pytest.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache is deliberately NOT enabled here.
# XLA:CPU AOT entries record host CPU features that the loader sometimes
# fails to re-match in a later process on the same machine ("could lead to
# execution errors such as SIGILL" warnings) — not worth the flake risk in
# the test suite. The TPU CLIs keep the cache (utils/jax_cache.py), where
# executables load via the TPU plugin and the issue does not apply.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def perturbed_init(model, x, seed=1):
    """model.init + a small fixed perturbation: nudges params off init
    symmetry (zero biases, equal PReLU slopes) so equivalence tests cannot
    pass by accident on a degenerate function. Shared by test_lr_tail /
    test_masked."""
    v = model.init(jax.random.PRNGKey(0), x)
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda a: a + 0.05 * rng.standard_normal(a.shape).astype(a.dtype), v
    )
