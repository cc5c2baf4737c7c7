"""Video streaming path: decode -> batched upscale -> encode roundtrip."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fast_srgan_tpu.inference import SRInferenceEngine  # noqa: E402
from fast_srgan_tpu.models import Generator  # noqa: E402
from fast_srgan_tpu.video import iter_video_frames, upscale_video  # noqa: E402


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "in.mp4")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (32, 16)
    )
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (16, 32, 3), dtype=np.uint8)
    for i in range(9):
        writer.write(np.roll(base, i, axis=1))
    writer.release()
    return path


class TestVideo:
    def test_iter_frames(self, tiny_video):
        frames = list(iter_video_frames(tiny_video))
        assert len(frames) == 9
        assert frames[0].shape == (16, 32, 3) and frames[0].dtype == np.uint8

    def test_upscale_video_roundtrip(self, tiny_video, tmp_path):
        model = Generator(n_filters=8, n_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        engine = SRInferenceEngine(
            params, n_filters=8, n_layers=1, dtype=jnp.float32
        )
        out_path = str(tmp_path / "out.mp4")
        stats = upscale_video(engine, tiny_video, out_path, batch_size=4)
        assert stats["frames"] == 9
        cap = cv2.VideoCapture(out_path)
        ok, frame = cap.read()
        assert ok and frame.shape == (64, 128, 3)
        n = 1
        while cap.read()[0]:
            n += 1
        assert n == 9
        cap.release()

    def test_missing_file_raises(self, tmp_path):
        model = Generator(n_filters=8, n_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        engine = SRInferenceEngine(params, n_filters=8, n_layers=1)
        with pytest.raises(FileNotFoundError):
            upscale_video(engine, str(tmp_path / "nope.mp4"), str(tmp_path / "o.mp4"))


class TestScale2Video:
    def test_writer_matches_engine_scale(self, tiny_video, tmp_path):
        # Regression: the writer was hardcoded to 4x — cv2 silently drops
        # wrong-sized frames, so a scale-2 engine produced an empty video
        # that still reported success.
        model = Generator(n_filters=8, n_layers=1, scale_factor=2)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        engine = SRInferenceEngine(
            params, n_filters=8, n_layers=1, dtype=jnp.float32,
            scale_factor=2,
        )
        out_path = str(tmp_path / "out2x.mp4")
        stats = upscale_video(engine, tiny_video, out_path, batch_size=4)
        assert stats["frames"] == 9
        cap = cv2.VideoCapture(out_path)
        ok, frame = cap.read()
        assert ok and frame.shape == (32, 64, 3)
        n = 1
        while cap.read()[0]:
            n += 1
        cap.release()
        assert n == 9


class TestMultiStream:
    """upscale_videos: N streams share one device pipeline."""

    def _make_video(self, path, n_frames, seed, size=(32, 16)):
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), 24, size
        )
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8)
        for i in range(n_frames):
            writer.write(np.roll(base, i, axis=1))
        writer.release()
        return path

    def test_two_streams_match_single_stream_outputs(self, tmp_path):
        from fast_srgan_tpu.video import upscale_videos

        a = self._make_video(str(tmp_path / "a.mp4"), 7, seed=1)
        b = self._make_video(str(tmp_path / "b.mp4"), 5, seed=2)  # shorter

        model = Generator(n_filters=8, n_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        engine = SRInferenceEngine(
            params, n_filters=8, n_layers=1, dtype=jnp.float32
        )

        outs = [str(tmp_path / "a4x.mp4"), str(tmp_path / "b4x.mp4")]
        stats = upscale_videos(engine, [a, b], outs, batch_size=4)
        assert stats["per_stream"] == [7, 5]

        # per-stream outputs must equal the single-stream pipeline's
        # (identical per-sample math regardless of batch composition;
        # mp4 re-encode is lossy so compare via a fresh decode of both)
        for src, multi, n in [(a, outs[0], 7), (b, outs[1], 5)]:
            single = str(tmp_path / ("ref_" + src.rsplit("/", 1)[1]))
            upscale_video(engine, src, single, batch_size=4)
            fm = list(iter_video_frames(multi))
            fs = list(iter_video_frames(single))
            assert len(fm) == len(fs) == n
            for x, y in zip(fm, fs):
                np.testing.assert_array_equal(x, y)

    def test_video_int8_calibrates_on_real_frames(self, tmp_path):
        """--video --int8 policy: activation scales come from the first
        decoded frames of the input streams (the image path's real-input
        policy), not the synthetic default batch (upscale_videos)."""
        from itertools import islice

        from fast_srgan_tpu import quant
        from fast_srgan_tpu.video import upscale_videos

        # >= 32x32: smaller frames are skipped by
        # calibration_batch_from_images and the engine would keep the
        # synthetic batch
        src = self._make_video(
            str(tmp_path / "q.mp4"), 9, seed=7, size=(48, 48)
        )
        model = Generator(n_filters=8, n_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        engine = SRInferenceEngine(
            params, n_filters=8, n_layers=1, dtype=jnp.float32,
            quantize=True,
        )
        default_scales = jax.tree_util.tree_map(
            np.asarray, engine.params["s"]
        )
        out = str(tmp_path / "q4x.mp4")
        stats = upscale_videos(engine, [src], [out], batch_size=4)
        assert stats["frames"] == 9

        first = list(islice(iter_video_frames(src, limit=8), 8))
        cb = quant.calibration_batch_from_images(first)
        assert cb is not None
        expected = quant.calibrate_scales(params, [cb], 4)
        got = jax.tree_util.tree_map(np.asarray, engine.params["s"])
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, got, expected
        )
        # and it really changed something vs the synthetic default
        changed = jax.tree_util.tree_reduce(
            lambda acc, pair: acc or bool(np.any(pair)),
            jax.tree_util.tree_map(
                lambda a, b: np.asarray(a != b), got, default_scales
            ),
            False,
        )
        assert changed

    def test_video_int8_respects_caller_calibration(self, tmp_path):
        """Caller-supplied calibration (calib_batches/act_scales or an
        explicit recalibrate()) must NOT be clobbered by the video path's
        auto-calibration — only default-calibrated engines re-scale."""
        from fast_srgan_tpu.video import upscale_videos

        src = self._make_video(
            str(tmp_path / "c.mp4"), 9, seed=11, size=(48, 48)
        )
        model = Generator(n_filters=8, n_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        rng = np.random.default_rng(4)
        curated = (
            rng.uniform(-1, 1, (2, 40, 40, 3)).astype(np.float32)
        )
        engine = SRInferenceEngine(
            params, n_filters=8, n_layers=1, dtype=jnp.float32,
            quantize=True, calib_batches=[curated],
        )
        assert engine.default_calibration is False
        before = jax.tree_util.tree_map(np.asarray, engine.params["s"])
        stats = upscale_videos(
            engine, [src], [str(tmp_path / "c4x.mp4")], batch_size=4
        )
        assert stats["frames"] == 9
        after = jax.tree_util.tree_map(np.asarray, engine.params["s"])
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, after, before
        )

    def test_auto_engine_recalibrates_per_call(self, tmp_path):
        """A default-calibrated engine stays auto-managed: a second
        upscale_videos call calibrates on ITS streams, not the first's."""
        from itertools import islice

        from fast_srgan_tpu import quant
        from fast_srgan_tpu.video import upscale_videos

        a = self._make_video(str(tmp_path / "a.mp4"), 9, seed=7, size=(48, 48))
        b = self._make_video(str(tmp_path / "b.mp4"), 9, seed=21, size=(48, 48))
        model = Generator(n_filters=8, n_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        engine = SRInferenceEngine(
            params, n_filters=8, n_layers=1, dtype=jnp.float32,
            quantize=True,
        )
        assert engine.default_calibration is True
        upscale_videos(engine, [a], [str(tmp_path / "a4.mp4")], batch_size=4)
        assert engine.default_calibration is True  # still auto-managed
        upscale_videos(engine, [b], [str(tmp_path / "b4.mp4")], batch_size=4)
        first = list(islice(iter_video_frames(b, limit=8), 8))
        cb = quant.calibration_batch_from_images(first)
        expected = quant.calibrate_scales(params, [cb], 4)
        got = jax.tree_util.tree_map(np.asarray, engine.params["s"])
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, got, expected
        )

    def test_mixed_sizes_rejected(self, tmp_path):
        from fast_srgan_tpu.video import upscale_videos

        a = self._make_video(str(tmp_path / "a.mp4"), 3, seed=1)
        c = self._make_video(
            str(tmp_path / "c.mp4"), 3, seed=3, size=(48, 16)
        )
        model = Generator(n_filters=8, n_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        engine = SRInferenceEngine(
            params, n_filters=8, n_layers=1, dtype=jnp.float32
        )
        with pytest.raises(ValueError, match="one frame size"):
            upscale_videos(
                engine, [a, c],
                [str(tmp_path / "x.mp4"), str(tmp_path / "y.mp4")],
            )
