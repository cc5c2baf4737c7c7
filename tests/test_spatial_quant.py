"""Spatially-tiled int8 forward: exactness vs the unsharded quant tier.

The int8 tier's activation scales are STATIC (calibrated constants), so
per-shard quantization commutes with the halo concatenation and the
width-sharded quantized program computes the same int8 contractions over
the same values as ``quant.sr_quant_forward`` (exactness argument in
fast_srgan_tpu/parallel/spatial.py's sharded-int8 section comment). These
tests assert it on the 8-device virtual CPU mesh for every quantization
arm (ups-only production / full / float tree), every scale factor
(2x/4x/8x), and the 2-D data x sp mesh.

The one admissible divergence: fp32 summation ORDER differs (psum'd
instance-norm statistics, halo'd conv tilings), which can land a float
trunk activation on the other side of a round() boundary — a +-1 int8
flip whose output effect is one dequant LSB. Tolerances below are set
for that: tight float atol plus a <=1 uint8-count bound on the rendered
output (the user-visible contract, same standard as tests/test_masked.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_srgan_tpu import quant
from fast_srgan_tpu.models import Generator
from fast_srgan_tpu.parallel.mesh import make_mesh
from fast_srgan_tpu.parallel.spatial import (
    build_tiled_forward,
    build_tiled_quant_forward,
)


def _setup(scale_factor=4, h=16, w=64, seed=0):
    model = Generator(n_filters=8, n_layers=2, scale_factor=scale_factor)
    params = model.init(jax.random.key(seed), jnp.zeros((1, 16, 16, 3)))
    rng = np.random.default_rng(seed)
    calib = jnp.asarray(rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32))
    scales = quant.calibrate_scales(
        params, [calib], scale_factor=scale_factor
    )
    x = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
    return model, params, scales, x


def _to_u8(y):
    return np.asarray(
        jnp.clip((jnp.asarray(y) + 1.0) * 127.5 + 0.5, 0, 255)
    ).astype(np.uint8)


def _assert_tiled_matches(single, tiled, atol):
    single, tiled = np.asarray(single), np.asarray(tiled)
    assert tiled.shape == single.shape
    np.testing.assert_allclose(tiled, single, atol=atol)
    u8 = _to_u8(tiled).astype(np.int32) - _to_u8(single).astype(np.int32)
    assert np.abs(u8).max() <= 1


class TestTiledQuantForward:
    def test_ups_only_matches_unsharded(self):
        """The production arm (ups int8, trunk+head float), fp32 glue."""
        _, params, scales, x = _setup()
        qtree = quant.quantize_generator_params(
            params, only=quant.is_ups_module
        )
        single = quant.sr_quant_forward(
            qtree, scales, x, glue_dtype=jnp.float32
        )
        mesh = make_mesh(8, axis_name="sp")
        fn = build_tiled_quant_forward(mesh, glue_dtype=jnp.float32)
        _assert_tiled_matches(single, fn(qtree, scales, x), atol=2e-3)

    def test_full_int8_matches_unsharded(self):
        """All convs int8 (every stem requantization crosses dist-IN)."""
        _, params, scales, x = _setup()
        qtree = quant.quantize_generator_params(params)
        single = quant.sr_quant_forward(
            qtree, scales, x, glue_dtype=jnp.float32
        )
        mesh = make_mesh(8, axis_name="sp")
        fn = build_tiled_quant_forward(mesh, glue_dtype=jnp.float32)
        _assert_tiled_matches(single, fn(qtree, scales, x), atol=2e-3)

    def test_float_tree_matches_float_tiled(self):
        """The unquantized tree through the quant sharded path must equal
        the float tiled forward tightly (validates the topology alone)."""
        _, params, scales, x = _setup()
        mesh = make_mesh(8, axis_name="sp")
        ref = build_tiled_forward(mesh, dtype=jnp.float32)(params, x)
        fn = build_tiled_quant_forward(mesh, glue_dtype=jnp.float32)
        out = fn(params["params"], scales, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5
        )

    @pytest.mark.parametrize("scale_factor", [2, 8])
    def test_other_scales_match_unsharded(self, scale_factor):
        _, params, scales, x = _setup(scale_factor=scale_factor)
        qtree = quant.quantize_generator_params(
            params, only=quant.is_ups_module
        )
        single = quant.sr_quant_forward(
            qtree, scales, x, scale_factor=scale_factor,
            glue_dtype=jnp.float32,
        )
        mesh = make_mesh(8, axis_name="sp")
        fn = build_tiled_quant_forward(
            mesh, glue_dtype=jnp.float32, scale_factor=scale_factor
        )
        out = fn(qtree, scales, x)
        assert np.asarray(out).shape == (
            1, 16 * scale_factor, 64 * scale_factor, 3,
        )
        _assert_tiled_matches(single, out, atol=2e-3)

    def test_2d_mesh_matches_unsharded(self):
        """data x sp composition: batched frames, each width-sharded."""
        from jax.sharding import Mesh

        _, params, scales, _ = _setup()
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.uniform(-1, 1, (4, 16, 32, 3)).astype(np.float32))
        qtree = quant.quantize_generator_params(
            params, only=quant.is_ups_module
        )
        single = quant.sr_quant_forward(
            qtree, scales, x, glue_dtype=jnp.float32
        )
        devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devices, ("data", "sp"))
        fn = build_tiled_quant_forward(mesh, glue_dtype=jnp.float32)
        _assert_tiled_matches(single, fn(qtree, scales, x), atol=2e-3)

    def test_bf16_glue_smoke(self):
        """The production glue dtype compiles and renders sanely."""
        _, params, scales, x = _setup()
        qtree = quant.quantize_generator_params(
            params, only=quant.is_ups_module
        )
        mesh = make_mesh(8, axis_name="sp")
        fn = build_tiled_quant_forward(mesh)  # bf16 default
        out = np.asarray(fn(qtree, scales, x))
        assert out.shape == (1, 64, 256, 3)
        assert np.isfinite(out).all() and np.abs(out).max() <= 1.0

    def test_rejects_bad_scale_factor(self):
        mesh = make_mesh(8, axis_name="sp")
        with pytest.raises(ValueError, match="scale_factor"):
            build_tiled_quant_forward(mesh, scale_factor=3)

    def test_convenience_matches_unsharded(self):
        """tiled_quant_upscale_u8 (the infer.py --int8 --tile primitive):
        uint8 in/out, <=1 count vs the single-device int8 rendering."""
        _, params, scales, _ = _setup()
        qtree = quant.quantize_generator_params(
            params, only=quant.is_ups_module
        )
        rng = np.random.default_rng(11)
        frame = rng.integers(0, 256, (16, 64, 3), dtype=np.uint8)
        x = jnp.asarray(frame[None]).astype(jnp.float32) / 127.5 - 1.0
        single = quant.sr_quant_forward(
            qtree, scales, x, glue_dtype=jnp.float32
        )
        single_u8 = np.asarray(
            ((jnp.asarray(single) + 1.0) * 127.5).clip(0, 255)
        ).astype(np.uint8)

        from fast_srgan_tpu.parallel.spatial import tiled_quant_upscale_u8

        mesh = make_mesh(8, axis_name="sp")
        out = tiled_quant_upscale_u8(
            qtree, scales, frame, mesh, glue_dtype=jnp.float32
        )
        assert out.shape == (64, 256, 3) and out.dtype == np.uint8
        diff = out.astype(np.int32) - single_u8[0].astype(np.int32)
        assert np.abs(diff).max() <= 1

    def test_convenience_rejects_2d_mesh(self):
        from jax.sharding import Mesh

        from fast_srgan_tpu.parallel.spatial import tiled_quant_upscale_u8

        _, params, scales, _ = _setup()
        qtree = quant.quantize_generator_params(
            params, only=quant.is_ups_module
        )
        devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devices, ("data", "sp"))
        with pytest.raises(ValueError, match="1-D mesh"):
            tiled_quant_upscale_u8(
                qtree, scales, np.zeros((16, 64, 3), np.uint8), mesh
            )

    def test_rejects_indivisible_width(self):
        _, params, scales, _ = _setup()
        qtree = quant.quantize_generator_params(
            params, only=quant.is_ups_module
        )
        mesh = make_mesh(8, axis_name="sp")
        fn = build_tiled_quant_forward(mesh, glue_dtype=jnp.float32)
        x = jnp.zeros((1, 16, 60, 3), jnp.float32)
        with pytest.raises(ValueError, match="not divisible"):
            fn(qtree, scales, x)


class TestTiledInt8CLI:
    """infer.py --int8 --tile: the CLI-driven composition of the two
    scaling tiers vs the single-device int8 rendering. Agreement contract
    (parallel/spatial.py sharded-int8 section): <=1 uint8 count
    everywhere except rare one-quantization-step flips — fp32
    reduction-order differences crossing a round() boundary — which are
    bounded at <=3 counts on a small fraction of pixels. Round-4 shipped
    the library path only; this pins the production entry point."""

    def test_cli_matches_single_device_int8(self, tmp_path):
        import os
        import subprocess
        import sys

        from PIL import Image

        from fast_srgan_tpu.checkpoints.npz_io import save_npz_params
        from fast_srgan_tpu.models import Generator

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        model = Generator(n_filters=8, n_layers=2)
        params = model.init(jax.random.key(3), jnp.zeros((1, 8, 8, 3)))
        ckpt = tmp_path / "tiny.npz"
        save_npz_params(str(ckpt), params)

        rng = np.random.default_rng(13)
        img_dir = tmp_path / "in"
        out_dir = tmp_path / "out"
        img_dir.mkdir()
        frames = {}
        for name in ("a.png", "b.png"):
            arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(img_dir / name)
            frames[name] = arr

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        env["PYTHONPATH"] = repo
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "infer.py"),
             "--image_dir", str(img_dir), "--output_dir", str(out_dir),
             "--checkpoint", str(ckpt), "--int8", "--tile", "8", "--fp32"],
            env=env, capture_output=True, text=True, timeout=600, cwd=repo,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]

        # Reproduce the CLI's exact policy single-device: ups-only PTQ,
        # activation scales calibrated on the same inputs in list order.
        names = sorted(frames)
        calib = quant.calibration_batch_from_images(
            frames[n] for n in names
        )
        scales = quant.calibrate_scales(params, [calib], 4)
        qtree = quant.quantize_generator_params(
            params, only=quant.is_ups_module
        )
        for name in names:
            x = (
                jnp.asarray(frames[name][None]).astype(jnp.float32) / 127.5
                - 1.0
            )
            y = quant.sr_quant_forward(
                qtree, scales, x, glue_dtype=jnp.float32
            )
            want = np.asarray(
                ((jnp.asarray(y) + 1.0) * 127.5).clip(0, 255)
            ).astype(np.uint8)[0]
            got = np.asarray(Image.open(out_dir / name))
            assert got.shape == want.shape == (192, 256, 3)
            diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
            assert diff.max() <= 3, (name, diff.max())
            assert (diff > 1).mean() < 0.02, (name, (diff > 1).mean())
