"""Inference engine: normalization parity, grouping, streaming, bucketing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_srgan_tpu.inference import SRInferenceEngine
from fast_srgan_tpu.models import Generator


def make_engine(rng, bucket=0, n_filters=8, n_layers=2):
    model = Generator(n_filters=n_filters, n_layers=n_layers)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    return SRInferenceEngine(
        params, n_filters=n_filters, n_layers=n_layers,
        dtype=jnp.float32, bucket=bucket,
    )


class TestUpscaleBatch:
    def test_normalization_matches_reference_recipe(self, rng):
        # uint8 path must equal: x/127.5-1 -> G -> (y+1)/2*255 -> uint8
        # (reference inference.py:50-56).
        engine = make_engine(rng)
        batch = rng.integers(0, 256, (2, 12, 16, 3), dtype=np.uint8)
        got = engine.upscale_batch(batch)
        x = jnp.asarray(batch).astype(jnp.float32) / 127.5 - 1.0
        y = engine.upscale_float(x)
        want = np.asarray(((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8))
        # Two separately-compiled programs: XLA fusion may round the last
        # bit differently, so allow a 1-count difference.
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1
        assert got.shape == (2, 48, 64, 3)

    def test_bucketed_pads_and_crops(self, rng):
        engine = make_engine(rng, bucket=16)
        batch = rng.integers(0, 256, (1, 12, 20, 3), dtype=np.uint8)
        out = engine.upscale_batch(batch)
        assert out.shape == (1, 48, 80, 3)  # cropped back to 4x input

    def test_bucket_batch_policy_uses_padded_dims(self, rng):
        # The program runs at the bucket-padded dims, so the pixel budget
        # must be applied to those — not the raw frame dims. 8x8 frames pad
        # to 16x16; a budget of 512 px admits eight 8x8 frames but only two
        # 16x16 ones (2..7 avoidance then drops to 1). Regression: the
        # unpadded dims allowed batch 8 -> 4096 px per program, 8x over
        # budget (the HBM-overshoot path on real frames just over a bucket
        # boundary), and disagreed with _grouped_upscale's choice for the
        # identical bucket shape.
        engine = make_engine(rng, bucket=16)
        engine.pixel_budget = 8 * 8 * 8
        calls = []
        orig = engine._forward_u8_masked

        def spy(params, batch, hs, ws):
            calls.append(tuple(batch.shape))
            return orig(params, batch, hs, ws)

        engine._forward_u8_masked = spy
        batch = rng.integers(0, 256, (8, 8, 8, 3), dtype=np.uint8)
        out = engine.upscale_batch(batch)
        assert out.shape == (8, 32, 32, 3)
        assert calls == [(1, 16, 16, 3)] * 8
        # and the policy agrees with what _grouped_upscale computes for the
        # same bucket shape (one shared compiled program across both APIs)
        assert engine.effective_batch_size(16, 16, 8) == 1


class TestUpscaleImages:
    def test_mixed_shapes_preserve_order(self, rng):
        engine = make_engine(rng)
        images = [
            rng.integers(0, 256, (10, 12, 3), dtype=np.uint8),
            rng.integers(0, 256, (8, 8, 3), dtype=np.uint8),
            rng.integers(0, 256, (10, 12, 3), dtype=np.uint8),
        ]
        outs = engine.upscale_images(images, batch_size=2)
        assert [o.shape for o in outs] == [
            (40, 48, 3), (32, 32, 3), (40, 48, 3),
        ]
        # order preserved: each output equals its own single upscale
        # (batch-2 and batch-1 are separately-compiled programs, so the last
        # uint8 bit may round differently — same tolerance as above).
        for im, out in zip(images, outs):
            single = engine.upscale_batch(im[None])[0]
            diff = np.abs(out.astype(np.int16) - single.astype(np.int16))
            assert diff.max() <= 1


class TestBatchSizePolicy:
    """effective_batch_size: never compile batch 2..7; cap batch pixels.

    The rule encodes two v5e measurements (docs/DESIGN.md): compiled batch
    sizes 2..7 run 3-5x slower per pixel than 1 or >=8, and a compiled
    batch over ~4.2M LR pixels fails to allocate.
    """

    def test_policy_values(self, rng):
        e = make_engine(rng)
        # small frames: 2..7 rounds up to 8, 1 and >=8 kept
        assert e.effective_batch_size(180, 320, 1) == 1
        for r in range(2, 8):
            assert e.effective_batch_size(180, 320, r) == 8
        assert e.effective_batch_size(180, 320, 8) == 8
        assert e.effective_batch_size(180, 320, 16) == 16
        # 540x960: budget caps at exactly 8
        assert e.effective_batch_size(540, 960, 16) == 8
        # 720x1280: batch 8 exceeds the budget -> 1 (never 2..7)
        assert e.effective_batch_size(720, 1280, 8) == 1
        # huge single frame still allowed (batch 1 is never blocked)
        assert e.effective_batch_size(2000, 3000, 8) == 1

    def test_policy_respects_custom_budget(self, rng):
        e = make_engine(rng)
        e.pixel_budget = 8 * 8 * 8
        assert e.effective_batch_size(8, 8, 8) == 8
        assert e.effective_batch_size(8, 16, 8) == 1  # cap 4 -> not 2..7

    def test_mesh_policy_is_per_device(self, rng):
        from fast_srgan_tpu.parallel.mesh import make_mesh

        model = Generator(n_filters=8, n_layers=2)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        e = SRInferenceEngine(
            params, n_filters=8, n_layers=2, dtype=jnp.float32,
            mesh=make_mesh(8),
        )
        # global 64 = 8 per device (fine); global 16 = 2 per device -> 64
        assert e.effective_batch_size(180, 320, 64) == 64
        assert e.effective_batch_size(180, 320, 16) == 64
        assert e.effective_batch_size(180, 320, 8) == 8  # 1 per device

    def test_small_batches_pad_to_compiled_size(self, rng):
        engine = make_engine(rng)
        batch = rng.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
        got = engine.upscale_batch(batch)
        assert got.shape == (3, 32, 32, 3)
        want = engine.upscale_batch(
            np.concatenate([batch, batch[-1:].repeat(5, 0)])
        )[:3]
        np.testing.assert_array_equal(got, want)

    def test_empty_batch_returns_empty(self, rng):
        engine = make_engine(rng)
        out = engine.upscale_batch(np.empty((0, 8, 8, 3), np.uint8))
        assert out.shape == (0, 32, 32, 3) and out.dtype == np.uint8

    def test_over_budget_batch_splits_into_chunks(self, rng):
        engine = make_engine(rng)
        engine.pixel_budget = 8 * 8 * 8  # cap: 8 frames of 8x8
        batch = rng.integers(0, 256, (9, 8, 8, 3), dtype=np.uint8)
        got = engine.upscale_batch(batch)
        assert got.shape == (9, 32, 32, 3)
        # each sample equals its batch-8-program upscale (per-sample norm)
        want = engine.upscale_batch(batch[:8])
        np.testing.assert_array_equal(got[:8], want)

    def test_pad_singletons_matches_batch1_output(self, rng):
        engine = make_engine(rng)
        image = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        padded = engine.upscale_images([image], pad_singletons=True)[0]
        single = engine.upscale_batch(image[None])[0]
        # padded runs the batch-8 program; batch-1 program may round the
        # last uint8 bit differently
        diff = np.abs(padded.astype(np.int16) - single.astype(np.int16))
        assert padded.shape == single.shape and diff.max() <= 1

    def test_stream_adopts_frame_size_policy(self, rng):
        engine = make_engine(rng)
        engine.pixel_budget = 8 * 8 * 2  # force batch 1 for 8x8 frames
        frames = [
            rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(3)
        ]
        outs = list(engine.stream(iter(frames), batch_size=8))
        assert len(outs) == 3
        for f, o in zip(frames, outs):
            np.testing.assert_array_equal(
                o, engine.upscale_batch(f[None])[0]
            )


class TestDataParallelEngine:
    def test_mesh_sharded_matches_single_device(self, rng):
        from fast_srgan_tpu.parallel.mesh import make_mesh

        model = Generator(n_filters=8, n_layers=2)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        single = SRInferenceEngine(
            params, n_filters=8, n_layers=2, dtype=jnp.float32
        )
        sharded = SRInferenceEngine(
            params, n_filters=8, n_layers=2, dtype=jnp.float32,
            mesh=make_mesh(8),
        )
        batch = rng.integers(0, 256, (8, 12, 16, 3), dtype=np.uint8)
        a = single.upscale_batch(batch)
        b = sharded.upscale_batch(batch)
        # instance-norm stats are per-sample, so DP sharding is exact up to
        # reduction order; uint8 rounding can differ by 1 count
        assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1


class TestPipelinedGrouping:
    def test_mesh_singleton_pads_to_mesh_divisible_batch(self, rng):
        # regression: the batch-1 shortcut must not fire on a mesh (a
        # batch of 1 cannot shard over the device axis)
        from fast_srgan_tpu.parallel.mesh import make_mesh

        model = Generator(n_filters=8, n_layers=2)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        engine = SRInferenceEngine(
            params, n_filters=8, n_layers=2, dtype=jnp.float32,
            mesh=make_mesh(8),
        )
        image = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        out = engine.upscale_images([image])[0]
        assert out.shape == (32, 32, 3)

    def test_decode_failure_yields_finished_batches_first(self, rng):
        # regression: with one batch in flight, a corrupt file in batch
        # t+1 must not discard batch t's completed outputs
        engine = make_engine(rng)
        good = [
            rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(9)
        ]

        def take(i):
            if i == 8:
                raise IOError("corrupt file")
            return good[i]

        sizes = [(8, 8)] * 9
        got = []
        gen = engine._grouped_upscale(sizes, take, batch_size=8)
        with pytest.raises(IOError):
            for i, out in gen:
                got.append(i)
        assert got == list(range(8))  # the full first batch was delivered


class TestStream:
    def test_stream_yields_all_frames_in_order(self, rng):
        engine = make_engine(rng)
        frames = [
            rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(10)
        ]
        outs = list(engine.stream(iter(frames), batch_size=4))
        assert len(outs) == 10
        for f, o in zip(frames, outs):
            np.testing.assert_array_equal(o, engine.upscale_batch(f[None])[0])


class TestLRTailEngine:
    def test_default_on_for_4x_and_matches_canonical(self, rng):
        model = Generator(n_filters=8, n_layers=2)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        kw = dict(n_filters=8, n_layers=2, dtype=jnp.float32)
        e_on = SRInferenceEngine(params, **kw)
        e_off = SRInferenceEngine(params, lr_tail=False, **kw)
        assert e_on.lr_tail and not e_off.lr_tail
        batch = rng.integers(0, 256, (2, 11, 13, 3), dtype=np.uint8)
        a = e_on.upscale_batch(batch)
        b = e_off.upscale_batch(batch)
        # Exact transform; separately-compiled programs may round the last
        # uint8 bit differently.
        assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1

    def test_auto_on_for_all_scales(self, rng):
        model = Generator(n_filters=8, n_layers=1, scale_factor=2)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        engine = SRInferenceEngine(
            params, n_filters=8, n_layers=1, dtype=jnp.float32, scale_factor=2
        )
        assert engine.lr_tail  # single-stage LR tail (ops/lr_tail.lr_tail_2x)
        out = engine.upscale_batch(
            rng.integers(0, 256, (1, 9, 10, 3), dtype=np.uint8)
        )
        assert out.shape == (1, 18, 20, 3)

        model8 = Generator(n_filters=8, n_layers=1, scale_factor=8)
        params8 = model8.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        engine8 = SRInferenceEngine(
            params8, n_filters=8, n_layers=1, dtype=jnp.float32,
            scale_factor=8,
        )
        assert engine8.lr_tail  # hierarchical tail (ops/lr_tail.lr_tail_8x)
        assert engine8.pixel_budget == SRInferenceEngine.PIXEL_BUDGET // 4
        out8 = engine8.upscale_batch(
            rng.integers(0, 256, (1, 9, 10, 3), dtype=np.uint8)
        )
        assert out8.shape == (1, 72, 80, 3)


class TestArchFromParams:
    """Architecture autodetection off the param tree (CLI `--checkpoint`
    with arbitrary generators; infer.py/serve.py/evaluate.py use this)."""

    @pytest.mark.parametrize(
        "n_filters,n_layers,scale",
        [(8, 1, 2), (16, 3, 4), (8, 2, 8)],
    )
    def test_roundtrip(self, n_filters, n_layers, scale):
        from fast_srgan_tpu.inference import arch_from_params

        model = Generator(
            n_filters=n_filters, n_layers=n_layers, scale_factor=scale
        )
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        assert arch_from_params(params) == {
            "n_filters": n_filters,
            "n_layers": n_layers,
            "scale_factor": scale,
        }
        # also accepts the inner tree (the spatial/tail code paths' layout)
        assert arch_from_params(params["params"])["n_filters"] == n_filters

    def test_rejects_non_generator_tree(self):
        from fast_srgan_tpu.inference import arch_from_params

        with pytest.raises(ValueError, match="neck_conv"):
            arch_from_params({"params": {"something": 1}})

    def test_pretrained_checkpoint(self):
        import os

        ckpt = os.path.join(
            os.path.dirname(__file__), "..", "models",
            "generator_pretrained.npz",
        )
        if not os.path.exists(ckpt):
            pytest.skip("pretrained checkpoint not present")
        from fast_srgan_tpu.checkpoints.npz_io import load_npz_params
        from fast_srgan_tpu.inference import arch_from_params

        assert arch_from_params(load_npz_params(ckpt)) == {
            "n_filters": 64, "n_layers": 8, "scale_factor": 4,
        }
