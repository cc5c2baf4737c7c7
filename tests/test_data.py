"""Data pipeline tests: preprocess cache, sampler determinism, native parity."""

import os

import numpy as np
import pytest
from PIL import Image

from fast_srgan_tpu.data.pipeline import CropSampler, PrefetchLoader, list_numpy_files
from fast_srgan_tpu.data.preprocess import ensure_numpy_cache, write_images_to_numpy


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    img_dir = tmp_path_factory.mktemp("imgs")
    npy_dir = str(tmp_path_factory.mktemp("cache") / "npy")
    rng = np.random.default_rng(0)
    for i in range(5):
        h, w = int(rng.integers(100, 160)), int(rng.integers(100, 160))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")
    write_images_to_numpy(str(img_dir), npy_dir, verbose=False)
    return str(img_dir), npy_dir


class TestPreprocess:
    def test_cache_contents_roundtrip(self, dataset):
        img_dir, npy_dir = dataset
        files = list_numpy_files(npy_dir)
        assert len(files) == 5
        arr = np.load(files[0])
        assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
        name = os.path.basename(files[0]).replace(".npy", ".png")
        ref = np.asarray(Image.open(os.path.join(img_dir, name)).convert("RGB"))
        np.testing.assert_array_equal(arr, ref)

    def test_lazy_trigger(self, dataset, tmp_path):
        img_dir, _ = dataset
        target = str(tmp_path / "lazy")
        ensure_numpy_cache(img_dir, target)
        assert len(list_numpy_files(target)) == 5
        # second call must be a no-op (dir exists)
        ensure_numpy_cache(img_dir, target)


class TestCropSampler:
    def test_crop_shape_and_content(self, dataset):
        _, npy_dir = dataset
        s = CropSampler(list_numpy_files(npy_dir), 24, 4, seed=1, backend="numpy")
        crop = s.crop(0)
        assert crop.shape == (96, 96, 3) and crop.dtype == np.uint8

    def test_seed_determinism(self, dataset):
        _, npy_dir = dataset
        paths = list_numpy_files(npy_dir)
        a = CropSampler(paths, 24, 4, seed=7, backend="numpy").random_batch(4)
        b = CropSampler(paths, 24, 4, seed=7, backend="numpy").random_batch(4)
        np.testing.assert_array_equal(a, b)

    def test_native_backend_matches_numpy(self, dataset):
        _, npy_dir = dataset
        from fast_srgan_tpu.data import native

        if not native.available():
            pytest.skip("native loader did not build")
        paths = list_numpy_files(npy_dir)
        a = CropSampler(paths, 24, 4, seed=3, backend="native").random_batch(8)
        b = CropSampler(paths, 24, 4, seed=3, backend="numpy").random_batch(8)
        np.testing.assert_array_equal(a, b)

    def test_native_rejects_bad_offsets(self, dataset):
        _, npy_dir = dataset
        from fast_srgan_tpu.data import native

        if not native.available():
            pytest.skip("native loader did not build")
        ds = native.NativeCropDataset(list_numpy_files(npy_dir))
        with pytest.raises(ValueError):
            ds.crop_batch(
                np.asarray([0], np.int32), np.asarray([10_000], np.int32),
                np.asarray([0], np.int32), 96,
            )

    def test_sharding_partitions_files(self, dataset):
        _, npy_dir = dataset
        paths = list_numpy_files(npy_dir)
        s0 = CropSampler(paths, 24, 4, shard=(0, 2), backend="numpy")
        s1 = CropSampler(paths, 24, 4, shard=(1, 2), backend="numpy")
        assert set(s0.paths).isdisjoint(s1.paths)
        assert len(s0.paths) + len(s1.paths) == len(paths)

    def test_mmap_lru_thread_safe_under_eviction(self, dataset):
        # Regression: concurrent crop_batch from PrefetchLoader workers used
        # to race the unlocked OrderedDict LRU (move_to_end after a
        # concurrent popitem evicted the key -> KeyError aborting training).
        # Tiny cache + many threads makes every access an eviction fight.
        import threading

        _, npy_dir = dataset
        s = CropSampler(list_numpy_files(npy_dir), 16, 4, seed=7, backend="numpy")
        s._max_open = 1
        errors = []

        def hammer(tid):
            rng = np.random.default_rng(tid)
            try:
                for _ in range(50):
                    idxs = rng.integers(0, len(s), size=4)
                    out = s.crop_batch(idxs, rng)
                    assert out.shape == (4, 64, 64, 3)
            except Exception as e:  # pragma: no cover - failure capture
                errors.append(e)

        threads = [threading.Thread(target=hammer, args=(t,)) for t in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors

    def test_crop_too_large_raises(self, dataset):
        _, npy_dir = dataset
        s = CropSampler(list_numpy_files(npy_dir), 64, 4, backend="numpy")  # 256 crop
        with pytest.raises(ValueError, match="smaller than crop"):
            s.crop(0)


class TestPrefetchLoader:
    def test_deterministic_across_worker_counts(self, dataset):
        _, npy_dir = dataset
        paths = list_numpy_files(npy_dir)

        def run(workers):
            s = CropSampler(paths, 24, 4, seed=5, backend="numpy")
            return list(PrefetchLoader(s, 4, 6, workers=workers))

        a, b = run(1), run(4)
        assert len(a) == len(b) == 6
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_batch_shapes(self, dataset):
        _, npy_dir = dataset
        s = CropSampler(list_numpy_files(npy_dir), 24, 4, seed=5, backend="numpy")
        for batch in PrefetchLoader(s, 3, 2):
            assert batch.shape == (3, 96, 96, 3) and batch.dtype == np.uint8


class TestPrefetchDeadlockRegression:
    def test_many_workers_small_window_completes(self, dataset):
        # Regression for a live-caught deadlock: with batch indices striped
        # across many workers and a small bound, a ticket-pool design let
        # later batches exhaust the window while the next-needed batch's
        # producer starved. The lead-window design must always complete.
        _, npy_dir = dataset
        s = CropSampler(list_numpy_files(npy_dir), 16, 4, seed=3, backend="numpy")
        loader = PrefetchLoader(s, 2, 400, prefetch=1, workers=8)
        n = sum(1 for _ in loader)
        assert n == 400

    def test_iter_from_resume_matches_full_stream(self, dataset):
        _, npy_dir = dataset
        paths = list_numpy_files(npy_dir)
        a = PrefetchLoader(
            CropSampler(paths, 16, 4, seed=9, backend="numpy"), 2, 10, workers=3
        )
        full = list(a)
        b = PrefetchLoader(
            CropSampler(paths, 16, 4, seed=9, backend="numpy"), 2, 10, workers=3
        )
        resumed = list(b.iter_from(6))
        assert len(resumed) == 4
        for x, y in zip(full[6:], resumed):
            np.testing.assert_array_equal(x, y)


class TestCacheCompleteness:
    def test_interrupted_cache_is_rebuilt(self, dataset, tmp_path):
        # Regression: a partial cache (interrupted first run: some .npy
        # files, no completeness sentinel) previously passed the "any .npy"
        # check forever, silently training on a subset.
        img_dir, _ = dataset
        target = str(tmp_path / "partial")
        os.makedirs(target)
        np.save(os.path.join(target, "0.npy"), np.zeros((8, 8, 3), np.uint8))
        ensure_numpy_cache(img_dir, target)
        assert len(list_numpy_files(target)) == 5
        assert os.path.exists(os.path.join(target, ".complete"))

    def test_complete_cache_not_rebuilt(self, dataset, tmp_path):
        img_dir, _ = dataset
        target = str(tmp_path / "full")
        ensure_numpy_cache(img_dir, target)
        first = {f: os.path.getmtime(f) for f in list_numpy_files(target)}
        ensure_numpy_cache(img_dir, target)  # must be a no-op
        assert {f: os.path.getmtime(f) for f in list_numpy_files(target)} == first

    def test_extension_collisions_get_unique_names(self, tmp_path):
        # 0001.png + 0001.jpg previously raced onto the same 0001.npy.
        img_dir = str(tmp_path / "imgs")
        os.makedirs(img_dir)
        rng = np.random.default_rng(0)
        for ext in ("png", "jpg"):
            Image.fromarray(
                rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            ).save(os.path.join(img_dir, f"0001.{ext}"))
        target = str(tmp_path / "cache")
        ensure_numpy_cache(img_dir, target)
        assert len(list_numpy_files(target)) == 2


class TestValSplit:
    """data.val_image_dir: held-out validation (make_loaders wiring)."""

    def _config(self, npy_dir, **data):
        from fast_srgan_tpu.config import default_config

        return default_config(
            data={
                "numpy_dir": npy_dir,
                "lr_image_size": 8,
                "scale_factor": 4,
                **data,
            },
            training={"pretrain_iterations": 2, "iterations": 2,
                      "batch_size": 2, "num_workers": 1},
        )

    def test_default_val_is_the_training_sampler(self, dataset):
        from fast_srgan_tpu.data.pipeline import make_loaders

        _, npy_dir = dataset
        val, pre, tr = make_loaders(self._config(npy_dir))
        assert val is pre.sampler is tr.sampler  # reference behavior

    def test_val_dir_builds_a_separate_sampler(self, dataset, tmp_path):
        from fast_srgan_tpu.data.pipeline import make_loaders

        _, npy_dir = dataset
        val_np = str(tmp_path / "val_np")
        os.makedirs(val_np)
        rng = np.random.default_rng(9)
        for i in range(3):
            np.save(
                os.path.join(val_np, f"v{i}.npy"),
                rng.integers(0, 256, (64, 64, 3), dtype=np.uint8),
            )
        cfg = self._config(
            npy_dir, val_image_dir="/does/not/matter", val_numpy_dir=val_np
        )
        val, pre, _ = make_loaders(cfg)
        assert val is not pre.sampler
        assert len(val) == 3 and all("v" in os.path.basename(p) for p in val.paths)

    def test_default_val_numpy_dir_derives_from_numpy_dir(self, dataset):
        from fast_srgan_tpu.data.pipeline import resolve_val_numpy_dir

        _, npy_dir = dataset
        cfg = self._config(npy_dir, val_image_dir="/some/dir")
        assert resolve_val_numpy_dir(cfg) == npy_dir.rstrip("/") + "_val"
        assert resolve_val_numpy_dir(self._config(npy_dir)) is None

    def test_empty_val_cache_raises(self, dataset, tmp_path):
        from fast_srgan_tpu.data.pipeline import make_loaders

        _, npy_dir = dataset
        empty = str(tmp_path / "empty_val")
        os.makedirs(empty)
        cfg = self._config(
            npy_dir, val_image_dir="/some/dir", val_numpy_dir=empty
        )
        with pytest.raises(ValueError, match="no .npy files"):
            make_loaders(cfg)


class TestValSamplerSharding:
    """Multi-host: the val sampler must never be file-sharded (uneven
    shards would desynchronize the global eval collectives)."""

    def test_sharded_loaders_keep_val_unsharded(self, dataset):
        from fast_srgan_tpu.data.pipeline import make_loaders

        _, npy_dir = dataset  # 5 files: uneven over 2 hosts (3/2)
        cfg = TestValSplit()._config(npy_dir)
        vals = []
        for index in (0, 1):
            val, pre, tr = make_loaders(cfg, shard=(index, 2))
            assert len(pre.sampler) in (2, 3)  # train side IS sharded
            assert len(val) == 5, "val sampler must see the full list"
            vals.append([os.path.basename(p) for p in val.paths])
        # identical lists on every host -> identical eval loop counts
        assert vals[0] == vals[1]

    def test_sharded_loaders_with_val_dir_keep_val_unsharded(
        self, dataset, tmp_path
    ):
        from fast_srgan_tpu.data.pipeline import make_loaders

        _, npy_dir = dataset
        val_np = str(tmp_path / "vnp")
        os.makedirs(val_np)
        rng = np.random.default_rng(1)
        for i in range(3):
            np.save(
                os.path.join(val_np, f"v{i}.npy"),
                rng.integers(0, 256, (48, 48, 3), dtype=np.uint8),
            )
        cfg = TestValSplit()._config(npy_dir, val_numpy_dir=val_np)
        for index in (0, 1):
            val, _, _ = make_loaders(cfg, shard=(index, 2))
            assert len(val) == 3

    def test_prebuilt_val_cache_without_image_dir(self, dataset, tmp_path):
        # data.val_numpy_dir alone = a prebuilt cache; must NOT silently
        # fall back to validating on the training files.
        from fast_srgan_tpu.data.pipeline import (
            make_loaders, resolve_val_numpy_dir,
        )

        _, npy_dir = dataset
        val_np = str(tmp_path / "prebuilt")
        os.makedirs(val_np)
        np.save(
            os.path.join(val_np, "only.npy"),
            np.random.default_rng(2).integers(
                0, 256, (48, 48, 3), dtype=np.uint8
            ),
        )
        cfg = TestValSplit()._config(npy_dir, val_numpy_dir=val_np)
        assert resolve_val_numpy_dir(cfg) == val_np
        val, pre, _ = make_loaders(cfg)
        assert val is not pre.sampler and len(val) == 1
