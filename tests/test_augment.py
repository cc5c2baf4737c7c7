"""training.augment: in-jit dihedral augmentation (ops/augment.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from fast_srgan_tpu.ops.augment import augment_dihedral

from test_train_steps import synthetic_batch, tiny_config
from fast_srgan_tpu.train.steps import build_bundle


def dihedral_variants(img: np.ndarray, square: bool):
    """All distinct transforms augment_dihedral can emit for one HWC image."""
    out = []
    for h in (False, True):
        for v in (False, True):
            for t in (False, True) if square else (False,):
                x = img
                if h:
                    x = x[:, ::-1, :]
                if v:
                    x = x[::-1, :, :]
                if t:
                    x = np.swapaxes(x, 0, 1)
                out.append(x)
    return out


class TestAugmentOp:
    def test_every_sample_is_a_dihedral_transform_and_all_8_occur(self):
        rng = np.random.default_rng(0)
        # distinct random content per sample so transforms are identifiable
        batch = rng.integers(0, 256, size=(64, 6, 6, 3), dtype=np.uint8)
        out = np.asarray(
            jax.jit(augment_dihedral)(jnp.asarray(batch), jax.random.key(1))
        )
        assert out.shape == batch.shape and out.dtype == batch.dtype
        seen = set()
        for i in range(batch.shape[0]):
            variants = dihedral_variants(batch[i], square=True)
            matches = [
                k for k, v in enumerate(variants)
                if np.array_equal(out[i], v)
            ]
            assert matches, f"sample {i} is not a dihedral transform"
            seen.add(matches[0])
        # 64 samples x uniform over 8: all classes occur w.h.p. (fixed key)
        assert len(seen) == 8, f"only {sorted(seen)} of 8 symmetries seen"

    def test_non_square_skips_transpose(self):
        rng = np.random.default_rng(3)
        batch = rng.integers(0, 256, size=(32, 4, 6, 3), dtype=np.uint8)
        out = np.asarray(
            augment_dihedral(jnp.asarray(batch), jax.random.key(2))
        )
        assert out.shape == batch.shape
        for i in range(batch.shape[0]):
            variants = dihedral_variants(batch[i], square=False)
            assert any(np.array_equal(out[i], v) for v in variants)

    def test_deterministic_under_same_key(self):
        batch = jnp.asarray(
            np.random.default_rng(4).integers(
                0, 256, size=(8, 6, 6, 3), dtype=np.uint8
            )
        )
        a = augment_dihedral(batch, jax.random.key(9))
        b = augment_dihedral(batch, jax.random.key(9))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestAugmentSteps:
    def test_pretrain_augmented_is_deterministic_and_differs_from_plain(
        self, rng
    ):
        batch = jnp.asarray(synthetic_batch(rng))
        runs = []
        for cfg in (
            tiny_config(augment=True),
            tiny_config(augment=True),
            tiny_config(),
        ):
            bundle, gs, _, _ = build_bundle(cfg)
            for _ in range(2):
                gs, loss = bundle.pretrain_step(gs, batch)
            runs.append(
                (float(loss), [np.asarray(x) for x in jax.tree.leaves(gs.params)])
            )
        (l_a, p_a), (l_b, p_b), (l_plain, p_plain) = runs
        assert l_a == l_b
        for x, y in zip(p_a, p_b):
            np.testing.assert_array_equal(x, y)
        # the augmented trajectory genuinely sees different data
        assert any(
            np.abs(x - y).max() > 0 for x, y in zip(p_a, p_plain)
        )

    def test_gan_shared_and_recompute_agree_under_augment(self, rng):
        batch = jnp.asarray(synthetic_batch(rng))
        key = jax.random.key(7)
        states = []
        for shared in (True, False):
            bundle, gs, ds, vp = build_bundle(
                tiny_config(augment=True, gan_shared_forward=shared)
            )
            gs, ds, m = bundle.gan_step(gs, ds, vp, batch, key)
            states.append((gs, float(m["g_loss"])))
        (ga, la), (gb, lb) = states
        np.testing.assert_allclose(la, lb, rtol=2e-5)
        for x, y in zip(
            jax.tree.leaves(ga.params), jax.tree.leaves(gb.params)
        ):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=1e-5
            )


class TestAugmentMesh:
    def test_augment_on_8_device_mesh_matches_single_device(self):
        """Coins are drawn over the GLOBAL batch shape inside jit, so the
        augmented step is partition-invariant (same threefry bits)."""
        from fast_srgan_tpu.parallel.mesh import make_mesh, shard_batch

        config = tiny_config(augment=True)
        batch_np = synthetic_batch(np.random.default_rng(55), batch=8)
        key = jax.random.key(21)

        bundle1, g1, d1, v1 = build_bundle(config)
        g1, _, m1 = bundle1.gan_step(g1, d1, v1, jnp.asarray(batch_np), key)

        mesh = make_mesh(8)
        bundle8, g8, d8, v8 = build_bundle(config, mesh=mesh)
        g8, _, m8 = bundle8.gan_step(
            g8, d8, v8, shard_batch(batch_np, mesh), key
        )

        np.testing.assert_allclose(
            float(m1["g_loss"]), float(m8["g_loss"]), rtol=2e-5
        )
        for a, b in zip(jax.tree.leaves(g1.params), jax.tree.leaves(g8.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )
