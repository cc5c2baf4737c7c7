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
