"""StableHLO deployment artifacts (fast_srgan_tpu/export.py)."""

import json
import os

import jax
import numpy as np
import pytest

from fast_srgan_tpu.export import (
    build_forward_u8,
    export_shape,
    load_exported_dir,
    save_exported_dir,
)
from fast_srgan_tpu.models import Generator


@pytest.fixture(scope="module")
def tiny_forward():
    import jax.numpy as jnp

    model = Generator(n_filters=8, n_layers=2, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    fwd = build_forward_u8(
        params, n_filters=8, n_layers=2, scale_factor=4, bf16=False
    )
    return fwd


class TestExportRoundtrip:
    def test_artifact_matches_jitted_forward_bitwise(
        self, tiny_forward, tmp_path
    ):
        exp = export_shape(tiny_forward, 2, 12, 16)
        out = str(tmp_path / "artifact")
        save_exported_dir(
            out, [((2, 12, 16), exp)],
            arch={"n_filters": 8, "n_layers": 2, "scale_factor": 4},
            bf16=False, lr_tail=True,
        )
        loaded = load_exported_dir(out)
        x = np.random.default_rng(1).integers(
            0, 256, (2, 12, 16, 3), dtype=np.uint8
        )
        got = np.asarray(loaded["forwards"][(2, 12, 16)](x))
        want = np.asarray(jax.jit(tiny_forward)(x))
        assert got.shape == (2, 48, 64, 3) and got.dtype == np.uint8
        np.testing.assert_array_equal(got, want)

    def test_manifest_schema(self, tiny_forward, tmp_path):
        exp = export_shape(tiny_forward, 1, 8, 8)
        out = str(tmp_path / "a2")
        save_exported_dir(
            out, [((1, 8, 8), exp)],
            arch={"n_filters": 8, "n_layers": 2, "scale_factor": 4},
            bf16=False, lr_tail=True,
        )
        m = json.load(open(os.path.join(out, "manifest.json")))
        assert m["format"].startswith("fast-srgan-tpu/stablehlo")
        (e,) = m["entries"]
        assert (e["batch"], e["height"], e["width"]) == (1, 8, 8)
        assert os.path.exists(os.path.join(out, e["file"]))

    def test_wrong_shape_rejected(self, tiny_forward, tmp_path):
        exp = export_shape(tiny_forward, 1, 8, 8)
        out = str(tmp_path / "a3")
        save_exported_dir(
            out, [((1, 8, 8), exp)],
            arch={"n_filters": 8, "n_layers": 2, "scale_factor": 4},
            bf16=False, lr_tail=True,
        )
        call = load_exported_dir(out)["forwards"][(1, 8, 8)]
        with pytest.raises(Exception):
            call(np.zeros((1, 9, 8, 3), np.uint8))


class TestExportDefaults:
    """The script's default path: bf16 compute, multi-platform lowering."""

    def test_bf16_multiplatform_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        model = Generator(n_filters=8, n_layers=2, dtype=jnp.bfloat16)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        fwd = build_forward_u8(
            params, n_filters=8, n_layers=2, scale_factor=4, bf16=True
        )
        exp = export_shape(fwd, 1, 8, 8, platforms=("cpu", "tpu"))
        assert set(exp.platforms) == {"cpu", "tpu"}
        out = str(tmp_path / "bf16")
        save_exported_dir(
            out, [((1, 8, 8), exp)],
            arch={"n_filters": 8, "n_layers": 2, "scale_factor": 4},
            bf16=True, lr_tail=True,
        )
        loaded = load_exported_dir(out)
        assert loaded["manifest"]["entries"][0]["bytes"] > 0
        x = np.random.default_rng(3).integers(
            0, 256, (1, 8, 8, 3), dtype=np.uint8
        )
        got = np.asarray(loaded["forwards"][(1, 8, 8)](x))
        want = np.asarray(jax.jit(fwd)(x))
        np.testing.assert_array_equal(got, want)

    def test_duplicate_shapes_rejected(self, tiny_forward, tmp_path):
        exp = export_shape(tiny_forward, 1, 8, 8)
        with pytest.raises(ValueError, match="duplicate"):
            save_exported_dir(
                str(tmp_path / "dup"),
                [((1, 8, 8), exp), ((1, 8, 8), exp)],
                arch={"n_filters": 8, "n_layers": 2, "scale_factor": 4},
                bf16=False, lr_tail=True,
            )


class TestEngineParity:
    def test_exported_forward_matches_live_engine(self, tmp_path):
        """The artifact and SRInferenceEngine share one normalization
        definition (inference.sr_forward_u8); in fp32 the outputs are
        bit-identical (no constant-folding reassociation)."""
        import jax.numpy as jnp

        from fast_srgan_tpu.inference import SRInferenceEngine

        model = Generator(n_filters=8, n_layers=2, dtype=jnp.float32)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        fwd = build_forward_u8(
            params, n_filters=8, n_layers=2, scale_factor=4,
            bf16=False, lr_tail=True,
        )
        exp = export_shape(fwd, 1, 12, 16)
        out = str(tmp_path / "engine")
        save_exported_dir(
            out, [((1, 12, 16), exp)],
            arch={"n_filters": 8, "n_layers": 2, "scale_factor": 4},
            bf16=False, lr_tail=True,
        )
        call = load_exported_dir(out)["forwards"][(1, 12, 16)]
        engine = SRInferenceEngine(
            params, n_filters=8, n_layers=2, scale_factor=4,
            dtype=jnp.float32, lr_tail=True,
        )
        x = np.random.default_rng(5).integers(
            0, 256, (1, 12, 16, 3), dtype=np.uint8
        )
        np.testing.assert_array_equal(
            np.asarray(call(x)), engine.upscale_batch(x)
        )

    def test_int8_export_matches_int8_engine(self, tmp_path):
        """quantize=True bakes the production int8 tier (ups-only policy,
        activation scales included) into the artifact; with identical
        calib batches the engine and artifact share scales, so fp32-glue
        outputs are bit-identical."""
        import jax.numpy as jnp

        from fast_srgan_tpu.inference import SRInferenceEngine

        model = Generator(n_filters=8, n_layers=2, dtype=jnp.float32)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        calib = [
            jnp.asarray(np.random.default_rng(7).uniform(
                -1, 1, (2, 12, 16, 3)
            ).astype(np.float32))
        ]
        fwd = build_forward_u8(
            params, n_filters=8, n_layers=2, scale_factor=4,
            bf16=False, quantize=True, calib_batches=calib,
        )
        exp = export_shape(fwd, 1, 12, 16)
        out = str(tmp_path / "int8")
        save_exported_dir(
            out, [((1, 12, 16), exp)],
            arch={"n_filters": 8, "n_layers": 2, "scale_factor": 4},
            bf16=False, lr_tail=True, quantize=True,
        )
        loaded = load_exported_dir(out)
        assert loaded["manifest"]["quantize"] is True
        call = loaded["forwards"][(1, 12, 16)]
        engine = SRInferenceEngine(
            params, n_filters=8, n_layers=2, scale_factor=4,
            dtype=jnp.float32, quantize=True, calib_batches=calib,
        )
        x = np.random.default_rng(9).integers(
            0, 256, (1, 12, 16, 3), dtype=np.uint8
        )
        np.testing.assert_array_equal(
            np.asarray(call(x)), engine.upscale_batch(x)
        )
