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

    def test_env_blank_means_unset_not_crash(self, monkeypatch):
        # `FASTSR_COMPILER_OPTIONS= python ...` (blank) is how shells
        # "unset" in one-liners: it must fall through to the default,
        # not be a JSON parse error.
        monkeypatch.setenv("FASTSR_COMPILER_OPTIONS", "")
        assert tuned_compiler_options(backend="tpu") == {
            "xla_tpu_scoped_vmem_limit_kib": "49152"
        }
        monkeypatch.setenv("FASTSR_COMPILER_OPTIONS", "   ")
        assert tuned_compiler_options(backend="cpu") is None


class TestEnvJsonOptions:
    """One env contract for every FASTSR_*_COMPILER_OPTIONS knob
    (utils/xla_opts.env_json_options): unset/blank -> not present,
    'null' -> explicitly none, else a JSON object."""

    def test_unset_and_blank(self, monkeypatch):
        from fast_srgan_tpu.utils.xla_opts import env_json_options

        monkeypatch.delenv("FASTSR_TRAIN_COMPILER_OPTIONS", raising=False)
        assert env_json_options("FASTSR_TRAIN_COMPILER_OPTIONS") == (
            False,
            None,
        )
        monkeypatch.setenv("FASTSR_TRAIN_COMPILER_OPTIONS", "")
        assert env_json_options("FASTSR_TRAIN_COMPILER_OPTIONS") == (
            False,
            None,
        )

    def test_null_and_object(self, monkeypatch):
        from fast_srgan_tpu.utils.xla_opts import env_json_options

        monkeypatch.setenv("FASTSR_TRAIN_COMPILER_OPTIONS", "null")
        assert env_json_options("FASTSR_TRAIN_COMPILER_OPTIONS") == (
            True,
            None,
        )
        monkeypatch.setenv("FASTSR_TRAIN_COMPILER_OPTIONS", '{"a": "1"}')
        assert env_json_options("FASTSR_TRAIN_COMPILER_OPTIONS") == (
            True,
            {"a": "1"},
        )

    def test_blank_train_options_do_not_break_build_bundle(self, monkeypatch):
        # End-to-end: the training-side consumer must treat blank as unset.
        from fast_srgan_tpu.config import default_config
        from fast_srgan_tpu.train.steps import build_bundle

        monkeypatch.setenv("FASTSR_TRAIN_COMPILER_OPTIONS", "")
        config = default_config(
            data={"lr_image_size": 8},
            generator={"n_filters": 4, "n_layers": 1},
            discriminator={"n_filters": 4},
            training={"vgg_weights": "pixel", "iterations": 0},
        )
        bundle, g_state, d_state, vgg_params = build_bundle(config)
        assert bundle is not None
