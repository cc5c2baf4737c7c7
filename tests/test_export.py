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
