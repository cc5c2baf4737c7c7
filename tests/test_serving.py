"""HTTP serving layer: micro-batching, bucket sharing, error paths."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from fast_srgan_tpu.inference import SRInferenceEngine
from fast_srgan_tpu.models import Generator
from fast_srgan_tpu.serving import MicroBatcher, make_server


@pytest.fixture(scope="module")
def engine():
    model = Generator(n_filters=8, n_layers=1)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    return SRInferenceEngine(
        params, n_filters=8, n_layers=1, dtype=jnp.float32, bucket=16
    )


@pytest.fixture(scope="module")
def server(engine):
    srv = make_server(engine, host="127.0.0.1", port=0, max_wait_ms=20.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()
    srv.batcher.close()


def _url(server, path):
    return f"http://127.0.0.1:{server.server_address[1]}{path}"


def _post_image(server, img: np.ndarray) -> np.ndarray:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    req = urllib.request.Request(_url(server, "/upscale"), data=buf.getvalue())
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.headers["Content-Type"] == "image/png"
        return np.asarray(Image.open(io.BytesIO(resp.read())))


class TestEndpoints:
    def test_healthz(self, server):
        with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"

    def test_upscale_matches_engine(self, server, engine, rng):
        img = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
        out = _post_image(server, img)
        want = engine.upscale_batch(img[None])[0]
        assert out.shape == (40, 56, 3)
        np.testing.assert_array_equal(out, want)

    def test_concurrent_mixed_sizes_batch_together(self, server, engine, rng):
        images = [
            rng.integers(0, 256, (9 + i, 12, 3), dtype=np.uint8)
            for i in range(6)
        ]
        outs = [None] * len(images)

        def call(i):
            outs[i] = _post_image(server, images[i])

        threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        before = server.batcher.stats["batches"]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for img, out in zip(images, outs):
            assert out.shape == (img.shape[0] * 4, img.shape[1] * 4, 3)
            want = engine.upscale_batch(img[None])[0]
            np.testing.assert_array_equal(out, want)
        # the 6 concurrent requests must have coalesced (fewer batches than
        # requests — with a 20ms join window at least some shared a batch)
        assert server.batcher.stats["batches"] - before < 6

    def test_bad_image_400(self, server):
        req = urllib.request.Request(
            _url(server, "/upscale"), data=b"not an image"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400

    def test_unknown_path_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(_url(server, "/nope"), timeout=30)
        assert e.value.code == 404


class TestMicroBatcher:
    def test_error_propagates_to_all_waiters(self):
        class Boom:
            def upscale_images(self, images, batch_size, pad_singletons=False):
                raise RuntimeError("boom")

        b = MicroBatcher(Boom(), max_batch=4, max_wait_ms=10.0)
        try:
            with pytest.raises(RuntimeError, match="boom"):
                b.submit(np.zeros((4, 4, 3), np.uint8))
            assert b.stats["errors"] == 1
        finally:
            b.close()


class TestHardening:
    def test_singleton_requests_use_padded_programs(self):
        seen = []

        class Spy:
            def upscale_images(self, images, batch_size, pad_singletons=False):
                seen.append((len(images), batch_size, pad_singletons))
                return [im.repeat(4, 0).repeat(4, 1) for im in images]

        b = MicroBatcher(Spy(), max_batch=4, max_wait_ms=1.0)
        try:
            out = b.submit(np.zeros((4, 4, 3), np.uint8))
            assert out.shape == (16, 16, 3)
            # one real request, no batcher-side junk padding; the engine is
            # told to pad singletons to the compiled batch per shape group,
            # so every bucket shape compiles exactly one program signature
            assert seen == [(1, 4, True)]
            assert b.stats["requests"] == 1
        finally:
            b.close()

    def test_close_fails_queued_requests_fast(self):
        import time as _time

        class Slow:
            def upscale_images(self, images, batch_size, pad_singletons=False):
                _time.sleep(0.5)
                return list(images)

        b = MicroBatcher(Slow(), max_batch=1, max_wait_ms=0.0)
        results = {}

        def call(name):
            try:
                results[name] = b.submit(np.zeros((2, 2, 3), np.uint8))
            except Exception as e:
                results[name] = e

        t1 = threading.Thread(target=call, args=("a",))
        t1.start()
        import time as _t
        _t.sleep(0.1)  # worker is now inside the slow engine call
        t2 = threading.Thread(target=call, args=("b",))
        t2.start()
        _t.sleep(0.1)  # b is queued behind the in-flight batch
        b.close()
        t1.join(timeout=10)
        t2.join(timeout=10)
        assert isinstance(results["a"], np.ndarray)  # in-flight completes
        assert isinstance(results["b"], RuntimeError)  # queued fails fast

    def test_oversized_body_413(self, engine):
        srv = make_server(
            engine, host="127.0.0.1", port=0, max_body_bytes=1024
        )
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.server_address[1]}/upscale",
                data=b"x" * 4096,
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=30)
            assert e.value.code == 413
        finally:
            srv.shutdown()
            srv.batcher.close()
