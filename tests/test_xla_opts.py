"""Tuned PJRT compiler-option resolution (utils/xla_opts.py).

The tuned scoped-VMEM option is TPU-only; these tests pin the gating
(TPU gets the measured tuning, every other backend gets None so a CPU/GPU
PJRT compiler never sees an unknown option name) and the
FASTSR_COMPILER_OPTIONS env contract (JSON override, `null` kill-switch).
"""

from __future__ import annotations

import jax

from fast_srgan_tpu.utils.xla_opts import tuned_compiler_options


class TestTunedCompilerOptions:
    def test_tpu_gets_tuned_set(self, monkeypatch):
        monkeypatch.delenv("FASTSR_COMPILER_OPTIONS", raising=False)
        opts = tuned_compiler_options(backend="tpu")
        assert opts == {"xla_tpu_scoped_vmem_limit_kib": "49152"}

    def test_non_tpu_backends_get_none(self, monkeypatch):
        monkeypatch.delenv("FASTSR_COMPILER_OPTIONS", raising=False)
        assert tuned_compiler_options(backend="cpu") is None
        assert tuned_compiler_options(backend="gpu") is None

    def test_env_override_replaces_tuned_set(self, monkeypatch):
        monkeypatch.setenv(
            "FASTSR_COMPILER_OPTIONS", '{"xla_foo": "1"}'
        )
        assert tuned_compiler_options(backend="tpu") == {"xla_foo": "1"}

    def test_env_null_disables(self, monkeypatch):
        monkeypatch.setenv("FASTSR_COMPILER_OPTIONS", "null")
        assert tuned_compiler_options(backend="tpu") is None

    def test_default_backend_resolution(self, monkeypatch):
        # No backend given: resolves via jax.default_backend() (cpu under
        # the test conftest) without touching devices or raising.
        monkeypatch.delenv("FASTSR_COMPILER_OPTIONS", raising=False)
        expected = (
            {"xla_tpu_scoped_vmem_limit_kib": "49152"}
            if jax.default_backend() == "tpu"
            else None
        )
        assert tuned_compiler_options() == expected

    def test_returns_fresh_dict(self, monkeypatch):
        # Callers may mutate the returned dict (jit kwargs); the module
        # constant must not be aliased.
        monkeypatch.delenv("FASTSR_COMPILER_OPTIONS", raising=False)
        a = tuned_compiler_options(backend="tpu")
        a["mutated"] = "1"
        assert "mutated" not in tuned_compiler_options(backend="tpu")
