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

# ---------------------------------------------------------------------------
# Two-tier suite: `pytest -m "not slow"` is the <3-minute per-commit gate;
# the full suite (~25 min on CPU, compile-dominated) remains the merge gate.
# Centralized here (rather than scattered decorators) and keyed on measured
# durations (pytest --durations): every entry below costs >8s on CPU, almost
# entirely XLA compilation of multi-device or full-size programs.
# ---------------------------------------------------------------------------

SLOW_NODE_PATTERNS = (
    # whole modules: every test compiles multi-device/full-model programs
    "test_inference_engine.py",
    "test_spatial.py",
    "test_spatial_quant.py",
    "test_masked.py",
    "test_trainer.py",
    "test_scaled_configs.py",
    "test_serving.py",
    "test_video.py",
    "test_lr_tail.py",
    "test_evaluate.py",
    # specific compile-heavy classes/tests in otherwise-quick modules
    "test_graft_entry.py::TestEntry",
    "test_graft_entry.py::TestDryrunMultichip::test_eight",
    "test_graft_entry.py::TestDryrunMultichip::test_four",
    "test_graft_entry.py::TestDryrunMultichip::test_self_provisions",
    "test_train_steps.py::TestGanStep",
    "test_train_steps.py::TestDataParallel",
    "test_train_steps.py::TestGradAccum",
    "test_train_steps.py::TestEma",
    "test_train_steps.py::TestLrSchedule",
    "test_train_steps.py::TestGradClip",
    "test_trainer.py::TestLrLogging",
    "test_train_steps.py::TestScheduleWarmStart",
    "test_export.py",
    "test_augment.py::TestAugmentSteps",
    "test_augment.py::TestAugmentMesh",
    "test_scale_factors.py::TestScaleFactors::test_2x_train_step",
    "test_vgg_parity.py::TestVGGParity::test_gan_step_uses_vgg_weights_file",
    "test_vgg_parity.py::TestVGGParity::test_pretrain_only_needs_no_vgg",
    "test_kernels.py",
    "test_multihost.py",
    "test_quant.py::TestOtherScales",
    "test_quant.py::TestEngineInt8",
    "test_quant.py::TestPretrainedBound",
    "test_quant.py::TestMaskedInt8",
    "test_quant.py::TestEngineInt8Mesh",
    "test_fused_upsample.py",
    "test_fused_upsample_v2.py",
    "test_pixel_shuffle_kernel.py",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in SLOW_NODE_PATTERNS):
            item.add_marker(pytest.mark.slow)


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
