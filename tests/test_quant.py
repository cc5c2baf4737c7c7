"""Int8 PTQ tier (fast_srgan_tpu/quant.py) tests.

Three contracts:
  * the float executor is the canonical model: `sr_float_forward` ==
    `Generator.apply` to float tolerance (the quantized graph provably
    mirrors the real topology);
  * quantization is bounded: int8 vs float PSNR on the same params/input
    clears a floor, including with the shipped pretrained weights
    (reference /root/reference/models/model.pt via the converter);
  * the engine integration (`SRInferenceEngine(quantize=True)`) serves
    uint8 batches, recalibrates without recompiling, and rejects the
    unsupported modes (bucketed/masked, Pallas) loudly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast_srgan_tpu import quant
from fast_srgan_tpu.models import Generator

from conftest import perturbed_init


def _psnr(a, b, peak=2.0):
    mse = float(jnp.mean((jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)) ** 2))
    return 10.0 * np.log10(peak * peak / max(mse, 1e-12))


def _small(scale_factor=4):
    m = Generator(
        n_filters=8, n_layers=2, dtype=jnp.float32, scale_factor=scale_factor
    )
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 12, 14, 3)).astype(np.float32)
    )
    v = perturbed_init(m, x)
    return m, v, x


class TestQuantTree:
    def test_structure_and_roundtrip(self):
        m, v, x = _small()
        q = quant.quantize_generator_params(v)
        p = v["params"]
        # every conv leaf got (qkernel int8, wscale f32[co]); alphas pass
        assert q["neck_conv"]["qkernel"].dtype == jnp.int8
        co = p["neck_conv"]["kernel"].shape[-1]
        assert q["neck_conv"]["wscale"].shape == (co,)
        assert "bias" in q["neck_conv"]
        assert q["neck_relu"] is p["neck_relu"]
        assert q["stem_0"]["conv1"]["qkernel"].dtype == jnp.int8
        assert "bias" not in q["stem_0"]["conv1"]  # use_bias=False convs
        # dequantized kernel within half a quantization step everywhere
        k = np.asarray(p["head_conv"]["kernel"], np.float32)
        deq = np.asarray(q["head_conv"]["qkernel"], np.float32) * np.asarray(
            q["head_conv"]["wscale"]
        )
        step = np.asarray(q["head_conv"]["wscale"])
        assert np.all(np.abs(deq - k) <= 0.5 * step + 1e-7)

    def test_exact_zero_stays_zero(self):
        k = jnp.zeros((3, 3, 4, 4)).at[1, 1, 0, 0].set(1.0)
        q, s = quant._quantize_kernel(k)
        assert int(jnp.sum(q != 0)) == 1  # zeros quantize to int8 zero


class TestFloatOracle:
    def test_matches_canonical_4x(self):
        m, v, x = _small(4)
        ref = m.apply(v, x)
        got = quant.sr_float_forward(v, x, scale_factor=4)
        assert ref.shape == got.shape
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=5e-4)

    def test_collect_covers_every_conv(self):
        m, v, x = _small(4)
        c = {}
        quant.sr_float_forward(v, x, scale_factor=4, collect=c)
        assert set(c) == {
            "neck", "stem_0_c1", "stem_0_c2", "stem_1_c1", "stem_1_c2",
            "bottleneck", "up0", "up1", "head",
        }
        scales = quant.calibrate_scales(v, [x], scale_factor=4)
        assert set(scales) == set(c)
        assert all(float(s) > 0 for s in scales.values())

    def test_calibrate_rejects_empty(self):
        m, v, x = _small(4)
        with pytest.raises(ValueError):
            quant.calibrate_scales(v, [], scale_factor=4)


class TestInt8Quality:
    def test_int8_close_to_float_4x(self):
        m, v, x = _small(4)
        ref = m.apply(v, x)
        scales = quant.calibrate_scales(v, [x], scale_factor=4)
        q = quant.quantize_generator_params(v)
        out = quant.sr_quant_forward(
            q, scales, x, scale_factor=4, glue_dtype=jnp.float32
        )
        assert _psnr(ref, out) > 32.0  # measured ~40 dB on random params


@pytest.mark.parametrize("sf", [2, 8])
class TestOtherScales:
    def test_oracle_and_int8(self, sf):
        m, v, x = _small(sf)
        ref = m.apply(v, x)
        got = quant.sr_float_forward(v, x, scale_factor=sf)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=5e-4)
        scales = quant.calibrate_scales(v, [x], scale_factor=sf)
        out = quant.sr_quant_forward(
            quant.quantize_generator_params(v), scales, x,
            scale_factor=sf, glue_dtype=jnp.float32,
        )
        assert _psnr(ref, out) > 32.0


class TestCalibrationHelpers:
    def test_default_batch_bounded(self):
        b = quant.default_calibration_batch(h=24, w=32, n=2)
        assert b.shape == (2, 24, 32, 3)
        assert float(jnp.max(jnp.abs(b))) <= 1.0

    def test_from_images_common_crop(self):
        rng = np.random.default_rng(0)
        imgs = [
            rng.integers(0, 256, (64, 48, 3), np.uint8),
            rng.integers(0, 256, (40, 100, 3), np.uint8),
            rng.integers(0, 256, (8, 8, 3), np.uint8),  # too small: skipped
        ]
        b = quant.calibration_batch_from_images(imgs, max_h=60, max_w=60)
        assert b.shape == (2, 40, 48, 3)
        assert float(jnp.max(jnp.abs(b))) <= 1.0

    def test_from_images_skips_non_rgb_channels(self):
        """Grayscale HxWx1 mixed with RGB must be skipped, not crash
        np.stack on ragged channel dims (round-4 ADVICE); RGBA slices."""
        rng = np.random.default_rng(1)
        imgs = [
            rng.integers(0, 256, (48, 48, 1), np.uint8),  # gray: skipped
            rng.integers(0, 256, (48, 48, 3), np.uint8),
            rng.integers(0, 256, (48, 48, 4), np.uint8),  # RGBA: sliced
        ]
        b = quant.calibration_batch_from_images(imgs)
        assert b.shape == (2, 48, 48, 3)

    def test_from_images_only_gray_is_none(self):
        assert (
            quant.calibration_batch_from_images(
                [np.zeros((48, 48, 1), np.uint8)]
            )
            is None
        )

    def test_from_images_none_usable(self):
        assert (
            quant.calibration_batch_from_images(
                [np.zeros((4, 4, 3), np.uint8)]
            )
            is None
        )

    def test_percentile_scales_clip_outliers(self):
        m, v, x = _small(4)
        s_max = quant.calibrate_scales(
            v, [x], scale_factor=4, percentile=None  # plain max-abs
        )
        s_q = quant.calibrate_scales(
            v, [x], scale_factor=4, percentile=99.0
        )
        assert set(s_q) == set(s_max)
        # a percentile of |x| can never exceed its max
        assert all(
            float(s_q[k]) <= float(s_max[k]) + 1e-9 for k in s_max
        )
        # the int8 forward under clipped scales still tracks the oracle
        ref = m.apply(v, x)
        out = quant.sr_quant_forward(
            quant.quantize_generator_params(v, only=quant.is_ups_module),
            s_q, x, scale_factor=4, glue_dtype=jnp.float32,
        )
        assert _psnr(ref, out) > 30.0

    def test_calibrate_accepts_uint8_and_hwc(self):
        m, v, _ = _small(4)
        img = np.random.default_rng(1).integers(0, 256, (12, 14, 3), np.uint8)
        scales = quant.calibrate_scales(v, [img], scale_factor=4)
        assert set(scales) and all(float(s) > 0 for s in scales.values())


class TestMaskedInt8:
    """Bucketed-exact int8: masked float trunk + int8 tail with pad
    re-zeroing (quant.sr_quant_forward_masked)."""

    @pytest.mark.parametrize(
        "sf,only", [(2, quant.is_tail_module), (4, quant.is_tail_module),
                    (8, quant.is_tail_module), (4, quant.is_ups_module)]
    )
    def test_masked_equals_unmasked_on_valid_region(self, sf, only):
        m, v, x = _small(sf)
        scales = quant.calibrate_scales(v, [x], scale_factor=sf)
        qtail = quant.quantize_generator_params(v, only=only)
        ref = quant.sr_quant_forward(
            qtail, scales, x, scale_factor=sf, glue_dtype=jnp.float32
        )
        # pad to a bigger canvas; the valid region must reproduce `ref`
        xp = jnp.pad(x, ((0, 0), (0, 4), (0, 6), (0, 0)))
        mdl = Generator(
            n_filters=8, n_layers=2, dtype=jnp.float32, scale_factor=sf
        )
        vh = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
        vw = jnp.full((x.shape[0],), x.shape[2], jnp.int32)
        out = quant.sr_quant_forward_masked(
            mdl, qtail, scales, xp, (vh, vw), glue_dtype=jnp.float32
        )
        crop = out[:, : ref.shape[1], : ref.shape[2], :]
        np.testing.assert_allclose(
            np.asarray(crop), np.asarray(ref), atol=5e-4
        )

    def test_masked_rejects_quantized_trunk(self):
        m, v, x = _small(4)
        scales = quant.calibrate_scales(v, [x], scale_factor=4)
        qfull = quant.quantize_generator_params(v)
        mdl = Generator(n_filters=8, n_layers=2, dtype=jnp.float32)
        vh = jnp.full((2,), 12, jnp.int32)
        vw = jnp.full((2,), 14, jnp.int32)
        with pytest.raises(ValueError, match="float trunk"):
            quant.sr_quant_forward_masked(
                mdl, qfull, scales, x, (vh, vw), glue_dtype=jnp.float32
            )

    @pytest.mark.parametrize("mode", ["ups", "tail"])
    def test_engine_bucketed_int8_matches_unbucketed(self, mode):
        from fast_srgan_tpu.inference import SRInferenceEngine

        m, v, x = _small(4)
        plain = SRInferenceEngine(
            v, n_filters=8, n_layers=2, dtype=jnp.float32, quantize=mode,
            calib_batches=[x],
        )
        bucketed = SRInferenceEngine(
            v, n_filters=8, n_layers=2, dtype=jnp.float32, quantize=mode,
            bucket=16, calib_batches=[x],
        )
        rng = np.random.default_rng(3)
        imgs = [
            rng.integers(0, 256, (12, 14, 3), np.uint8),
            rng.integers(0, 256, (9, 11, 3), np.uint8),
        ]
        outs_b = bucketed.upscale_images(imgs)  # one 16x16-bucket batch
        for im, ob in zip(imgs, outs_b):
            ref = plain.upscale_batch(im[None])[0]
            assert ob.shape == ref.shape
            # fp32 glue: identical up to reassociation across program
            # shapes -> at most 1 uint8 count
            assert np.abs(ob.astype(int) - ref.astype(int)).max() <= 1


class TestEngineInt8Mesh:
    """Data-parallel int8 serving: the quantized {q, s} tree replicates
    over a mesh and batch-sharded execution matches single-device."""

    def test_mesh_matches_single_device(self):
        from fast_srgan_tpu.inference import SRInferenceEngine
        from fast_srgan_tpu.parallel.mesh import make_mesh

        m, v, x = _small(4)
        single = SRInferenceEngine(
            v, n_filters=8, n_layers=2, dtype=jnp.float32, quantize=True,
            calib_batches=[x],
        )
        meshed = SRInferenceEngine(
            v, n_filters=8, n_layers=2, dtype=jnp.float32, quantize=True,
            calib_batches=[x], mesh=make_mesh(8),
        )
        batch = np.random.default_rng(5).integers(
            0, 256, (8, 12, 14, 3), np.uint8
        )
        a = single.upscale_batch(batch)
        b = meshed.upscale_batch(batch)
        np.testing.assert_array_equal(a, b)

    def test_mesh_bucketed_int8_matches_single_device(self):
        """The full serving combination — mesh + bucket + int8 (what a
        multi-chip `serve.py --int8` deployment runs): masked int8 over a
        batch-sharded mesh equals the single-device masked program."""
        from fast_srgan_tpu.inference import SRInferenceEngine
        from fast_srgan_tpu.parallel.mesh import make_mesh

        m, v, x = _small(4)
        kw = dict(
            n_filters=8, n_layers=2, dtype=jnp.float32, quantize=True,
            bucket=16, calib_batches=[x],
        )
        single = SRInferenceEngine(v, **kw)
        meshed = SRInferenceEngine(v, mesh=make_mesh(8), **kw)
        rng = np.random.default_rng(11)
        imgs = [
            rng.integers(0, 256, (12, 14, 3), np.uint8),
            rng.integers(0, 256, (9, 11, 3), np.uint8),
        ] * 4  # 8 mixed-size frames -> one bucketed mesh batch
        outs_s = single.upscale_images(imgs, batch_size=8)
        outs_m = meshed.upscale_images(imgs, batch_size=8)
        for a, b in zip(outs_s, outs_m):
            np.testing.assert_array_equal(a, b)


class TestEngineGuards:
    def test_bucket_rejected_for_full_mode(self):
        from fast_srgan_tpu.inference import SRInferenceEngine

        m, v, _ = _small(4)
        with pytest.raises(ValueError, match="float trunk"):
            SRInferenceEngine(
                v, n_filters=8, n_layers=2, bucket=32, quantize="full"
            )

    def test_pallas_rejected(self):
        from fast_srgan_tpu.inference import SRInferenceEngine

        m, v, _ = _small(4)
        with pytest.raises(ValueError, match="allas"):
            SRInferenceEngine(
                v, n_filters=8, n_layers=2, use_pallas=True, quantize=True
            )

    def test_int8_ups_pixel_budget(self):
        """Unbucketed production int8 gets its own measured (larger)
        batch budget — the bench-measured 112@180x320 operating point —
        while bf16 and the (unswept) masked path keep the conservative
        bf16 budget."""
        from fast_srgan_tpu.inference import SRInferenceEngine

        m, v, x = _small(4)
        kw = dict(n_filters=8, n_layers=2, dtype=jnp.float32)
        bf16 = SRInferenceEngine(v, **kw)
        i8 = SRInferenceEngine(v, quantize=True, calib_batches=[x], **kw)
        i8b = SRInferenceEngine(
            v, quantize=True, bucket=16, calib_batches=[x], **kw
        )
        assert bf16.pixel_budget == SRInferenceEngine.PIXEL_BUDGET
        assert i8.pixel_budget == SRInferenceEngine.INT8_UPS_PIXEL_BUDGET
        assert i8b.pixel_budget == SRInferenceEngine.PIXEL_BUDGET
        assert i8.effective_batch_size(180, 320, requested=256) == 128
        assert bf16.effective_batch_size(180, 320, requested=256) == 72
        # explicit pixel_budget still wins
        custom = SRInferenceEngine(
            v, quantize=True, calib_batches=[x], pixel_budget=1000, **kw
        )
        assert custom.pixel_budget == 1000

    @pytest.mark.parametrize("scale,batch", [(2, 128), (8, 16)])
    def test_int8_ups_pixel_budget_other_scales(self, scale, batch):
        """2x/8x int8 get their own swept budgets (eval_int8 --scale,
        v5e 2026-08-20): 2x optimum batch 128 at 180x320 (same pixel
        count as 4x), 8x batch 16 (the hierarchical tail's int32 buffers
        OOM at 32)."""
        from fast_srgan_tpu.inference import SRInferenceEngine

        m, v, x = _small(scale)
        kw = dict(n_filters=8, n_layers=2, dtype=jnp.float32,
                  scale_factor=scale)
        i8 = SRInferenceEngine(v, quantize=True, calib_batches=[x], **kw)
        assert (
            i8.pixel_budget
            == SRInferenceEngine.INT8_UPS_PIXEL_BUDGETS[scale]
        )
        assert i8.effective_batch_size(180, 320, requested=256) == batch

    def test_recalibrate_requires_quantize(self):
        from fast_srgan_tpu.inference import SRInferenceEngine

        m, v, _ = _small(4)
        eng = SRInferenceEngine(v, n_filters=8, n_layers=2)
        with pytest.raises(ValueError, match="quantize"):
            eng.recalibrate([jnp.zeros((1, 12, 14, 3))])


class TestDeviceGenerationWarning:
    class _FakeDev:
        def __init__(self, platform, kind):
            self.platform = platform
            self.device_kind = kind

    def _run(self, monkeypatch, platform, kind):
        import fast_srgan_tpu.inference as inf

        monkeypatch.setattr(inf, "_warned_device_generation", False)
        monkeypatch.setattr(
            inf.jax, "devices", lambda: [self._FakeDev(platform, kind)]
        )
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            inf._warn_unprofiled_device_generation()
        return [str(x.message) for x in w]

    def test_warns_on_other_tpu_generation(self, monkeypatch):
        msgs = self._run(monkeypatch, "tpu", "TPU v4")
        assert any("batch policy" in m for m in msgs)

    def test_silent_on_v5e(self, monkeypatch):
        assert self._run(monkeypatch, "tpu", "TPU v5 lite") == []

    def test_silent_on_cpu(self, monkeypatch):
        assert self._run(monkeypatch, "cpu", "cpu") == []

    def test_warns_once(self, monkeypatch):
        import fast_srgan_tpu.inference as inf

        msgs = self._run(monkeypatch, "tpu", "TPU v4")
        assert msgs
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            inf._warn_unprofiled_device_generation()
        assert w == []


class TestEngineInt8:
    """Compile-heavy engine integration (slow tier)."""

    def test_uint8_batch_close_to_float_engine(self):
        from fast_srgan_tpu.inference import SRInferenceEngine

        m, v, x = _small(4)
        base = SRInferenceEngine(
            v, n_filters=8, n_layers=2, dtype=jnp.float32
        )
        qeng = SRInferenceEngine(
            v, n_filters=8, n_layers=2, dtype=jnp.float32, quantize=True,
            calib_batches=[x],
        )
        rng = np.random.default_rng(0)
        batch = rng.integers(0, 256, (1, 12, 14, 3), np.uint8)
        ref = base.upscale_batch(batch).astype(np.float32)
        out = qeng.upscale_batch(batch).astype(np.float32)
        assert out.shape == ref.shape
        mse = float(np.mean((ref - out) ** 2))
        assert 10 * np.log10(255.0**2 / max(mse, 1e-12)) > 30.0

    def test_recalibrate_no_recompile(self):
        from fast_srgan_tpu.inference import SRInferenceEngine

        m, v, x = _small(4)
        eng = SRInferenceEngine(
            v, n_filters=8, n_layers=2, dtype=jnp.float32, quantize=True,
            calib_batches=[x],
        )
        batch = np.random.default_rng(1).integers(
            0, 256, (1, 12, 14, 3), np.uint8
        )
        eng.upscale_batch(batch)
        n0 = eng._forward_u8._cache_size()
        eng.recalibrate([x * 0.5])
        out = eng.upscale_batch(batch)
        assert out.shape == (1, 48, 56, 3)
        assert eng._forward_u8._cache_size() == n0

    def test_upscale_float_is_quant_forward(self):
        from fast_srgan_tpu.inference import SRInferenceEngine

        m, v, x = _small(4)
        eng = SRInferenceEngine(
            v, n_filters=8, n_layers=2, dtype=jnp.float32, quantize="full",
            calib_batches=[x],
        )
        scales = quant.calibrate_scales(v, [x], scale_factor=4)
        direct = quant.sr_quant_forward(
            quant.quantize_generator_params(v), scales, x,
            scale_factor=4, glue_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(eng.upscale_float(x)), np.asarray(direct), atol=1e-5
        )

    def test_default_mode_is_ups_only(self):
        from fast_srgan_tpu.inference import SRInferenceEngine

        m, v, x = _small(4)
        eng = SRInferenceEngine(
            v, n_filters=8, n_layers=2, dtype=jnp.float32, quantize=True,
            calib_batches=[x],
        )
        assert eng.quantize_mode == "ups"
        q = eng.params["q"]
        # trunk AND head stay float, upsampling stages are int8
        assert "kernel" in q["neck_conv"] and "kernel" in q["stem_0"]["conv1"]
        assert "kernel" in q["head_conv"]
        assert q["upsampling_0"]["conv"]["qkernel"].dtype == jnp.int8
        direct = quant.sr_quant_forward(
            quant.quantize_generator_params(
                v, only=quant.is_ups_module
            ),
            quant.calibrate_scales(v, [x], scale_factor=4), x,
            scale_factor=4, glue_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(eng.upscale_float(x)), np.asarray(direct), atol=1e-5
        )

    def test_tail_mode_selectable(self):
        from fast_srgan_tpu.inference import SRInferenceEngine

        m, v, x = _small(4)
        eng = SRInferenceEngine(
            v, n_filters=8, n_layers=2, dtype=jnp.float32, quantize="tail",
            calib_batches=[x],
        )
        assert eng.quantize_mode == "tail"
        q = eng.params["q"]
        assert q["head_conv"]["qkernel"].dtype == jnp.int8
        assert q["upsampling_0"]["conv"]["qkernel"].dtype == jnp.int8

    def test_bad_mode_rejected(self):
        from fast_srgan_tpu.inference import SRInferenceEngine

        m, v, _ = _small(4)
        with pytest.raises(ValueError, match="quantize must be"):
            SRInferenceEngine(v, n_filters=8, n_layers=2, quantize="int4")


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/reference/models/model.pt"),
    reason="reference pretrained checkpoint not present",
)
class TestPretrainedBound:
    """The shipped-weights quality contract (slow tier)."""

    def test_psnr_bound_pretrained(self):
        from fast_srgan_tpu.checkpoints.torch_compat import (
            load_reference_generator_params,
        )

        params = load_reference_generator_params(
            "/root/reference/models/model.pt"
        )
        x = quant.default_calibration_batch(h=48, w=64, n=2, seed=3)
        ref = quant.sr_float_forward(params, x, scale_factor=4)
        scales = quant.calibrate_scales(params, [x], scale_factor=4)
        # uint8 output domain, like serving
        to_u8 = lambda y: np.clip(
            (np.asarray(y, np.float32) + 1) * 127.5, 0, 255
        )

        def psnr_of(only):
            out = quant.sr_quant_forward(
                quant.quantize_generator_params(params, only=only),
                scales, x, scale_factor=4, glue_dtype=jnp.float32,
            )
            mse = float(np.mean((to_u8(ref) - to_u8(out)) ** 2))
            return 10 * np.log10(255.0**2 / max(mse, 1e-12))

        psnr_full = psnr_of(None)
        assert psnr_full > 33.0, (
            f"full int8 vs fp32 PSNR {psnr_full:.2f} dB below bound"
        )
        # the production policy (engine quantize=True): ups-only —
        # measured 41.91 dB on chip at 96x160 (scripts/eval_int8.py)
        psnr_ups = psnr_of(quant.is_ups_module)
        assert psnr_ups > 37.0, (
            f"ups-only int8 vs fp32 PSNR {psnr_ups:.2f} dB below bound"
        )
        assert psnr_ups > psnr_full  # fewer quantized layers, higher fidelity
