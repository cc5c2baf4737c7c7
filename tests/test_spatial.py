"""Spatially-tiled inference: exactness vs the single-device generator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_srgan_tpu.models import Generator
from fast_srgan_tpu.parallel.mesh import make_mesh
from fast_srgan_tpu.parallel.spatial import (
    build_tiled_forward,
    generator_forward_local,
)


@pytest.fixture(scope="module")
def small_gen():
    model = Generator(n_filters=8, n_layers=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    return model, params


class TestFunctionalTwin:
    def test_matches_flax_module(self, small_gen, rng):
        model, params = small_gen
        x = jnp.asarray(rng.uniform(-1, 1, (2, 12, 20, 3)).astype(np.float32))
        a = model.apply(params, x)
        b = generator_forward_local(params["params"], x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_pretrained_twin_matches(self, rng):
        # Same check with the real converted checkpoint (the production path).
        import os
        ckpt = "/root/reference/models/model.pt"
        if not os.path.exists(ckpt):
            pytest.skip("reference checkpoint not mounted")
        from fast_srgan_tpu.checkpoints.torch_compat import (
            load_reference_generator_params,
        )
        params = load_reference_generator_params(ckpt)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 24, 40, 3)).astype(np.float32))
        a = Generator().apply(params, x)
        b = generator_forward_local(params["params"], x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestTiledForward:
    """Halo exchange + psum'd instance norm == single-device, exactly."""

    def test_matches_single_device(self, small_gen, rng):
        model, params = small_gen
        mesh = make_mesh(8, axis_name="sp")
        x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 64, 3)).astype(np.float32))
        single = np.asarray(model.apply(params, x))
        tiled_fn = build_tiled_forward(mesh, dtype=jnp.float32)
        tiled = np.asarray(tiled_fn(params, x))
        assert tiled.shape == single.shape == (1, 64, 256, 3)
        # fp32; only reduction-order differences allowed.
        np.testing.assert_allclose(tiled, single, atol=3e-5)

    def test_rejects_indivisible_width(self, small_gen):
        _, params = small_gen
        mesh = make_mesh(8, axis_name="sp")
        tiled_fn = build_tiled_forward(mesh, dtype=jnp.float32)
        with pytest.raises(ValueError, match="divisible"):
            tiled_fn(params, jnp.zeros((1, 16, 60, 3)))

    def test_4k_shape_runs(self, small_gen):
        # 540x960 LR -> 2160x3840 (4K) across 8 shards; tiny channel count
        # keeps CPU runtime sane — the sharding logic is shape-agnostic.
        _, params = small_gen
        mesh = make_mesh(8, axis_name="sp")
        tiled_fn = build_tiled_forward(mesh, dtype=jnp.float32)
        y = tiled_fn(params, jnp.zeros((1, 540, 960, 3)))
        assert y.shape == (1, 2160, 3840, 3)


class TestTiledOtherScales:
    def test_2x_tiled_matches_single(self, rng):
        model = Generator(n_filters=8, n_layers=2, scale_factor=2)
        params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        mesh = make_mesh(8, axis_name="sp")
        x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 64, 3)).astype(np.float32))
        single = np.asarray(model.apply(params, x))
        tiled = np.asarray(build_tiled_forward(mesh, dtype=jnp.float32)(params, x))
        assert tiled.shape == single.shape == (1, 32, 128, 3)
        np.testing.assert_allclose(tiled, single, atol=3e-5)

    def test_8x_tiled_matches_single(self, rng):
        # hierarchical sharded tail: stage 0 per shard, 4x transform at 2x
        model = Generator(n_filters=8, n_layers=1, scale_factor=8)
        params = model.init(jax.random.key(2), jnp.zeros((1, 8, 8, 3)))
        mesh = make_mesh(8, axis_name="sp")
        x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 32, 3)).astype(np.float32))
        single = np.asarray(model.apply(params, x))
        tiled = np.asarray(
            build_tiled_forward(mesh, dtype=jnp.float32)(params, x)
        )
        assert tiled.shape == single.shape == (1, 64, 256, 3)
        np.testing.assert_allclose(tiled, single, atol=3e-5)


class TestTiledLRTail:
    def test_both_tail_modes_match_single_device(self, small_gen, rng):
        # default (LR-domain tail per shard) and canonical tiled tail must
        # both reproduce the single-device forward exactly.
        model, params = small_gen
        mesh = make_mesh(8, axis_name="sp")
        x = jnp.asarray(rng.uniform(-1, 1, (1, 12, 48, 3)).astype(np.float32))
        single = np.asarray(model.apply(params, x))
        lr = np.asarray(
            build_tiled_forward(mesh, dtype=jnp.float32, lr_tail=True)(params, x)
        )
        canon = np.asarray(
            build_tiled_forward(mesh, dtype=jnp.float32, lr_tail=False)(params, x)
        )
        np.testing.assert_allclose(lr, single, atol=3e-5)
        np.testing.assert_allclose(canon, single, atol=3e-5)


class TestBatchedTiledForward:
    """2-D mesh: batch over 'data' x width over 'sp' (dp x sp combined)."""

    def test_2d_mesh_matches_single_device(self, small_gen, rng):
        import numpy as onp
        from jax.sharding import Mesh

        model, params = small_gen
        devices = onp.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devices, ("data", "sp"))
        x = jnp.asarray(rng.uniform(-1, 1, (4, 16, 32, 3)).astype(np.float32))
        single = np.asarray(model.apply(params, x))
        tiled_fn = build_tiled_forward(mesh, dtype=jnp.float32)
        tiled = np.asarray(tiled_fn(params, x))
        assert tiled.shape == single.shape == (4, 64, 128, 3)
        np.testing.assert_allclose(tiled, single, atol=3e-5)

    def test_2d_mesh_rejects_bad_batch(self, small_gen):
        import numpy as onp
        from jax.sharding import Mesh

        _, params = small_gen
        mesh = Mesh(onp.asarray(jax.devices()[:8]).reshape(2, 4),
                    ("data", "sp"))
        tiled_fn = build_tiled_forward(mesh, dtype=jnp.float32)
        with pytest.raises(ValueError, match="batch 3 not divisible"):
            tiled_fn(params, jnp.zeros((3, 16, 32, 3)))

    def test_rejects_mesh_without_sp_axis(self):
        import numpy as onp
        from jax.sharding import Mesh

        mesh = Mesh(onp.asarray(jax.devices()[:8]).reshape(2, 4),
                    ("a", "b"))
        with pytest.raises(ValueError, match="no spatial axis"):
            build_tiled_forward(mesh, dtype=jnp.float32)
