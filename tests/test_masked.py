"""Exactness of the masked (zero-pad-bucketed) forward.

The claim under test: padding a frame to a bucket shape and running the
masked forward (Generator valid_hw / SRInferenceEngine bucket>0) produces
*exactly* what the unpadded forward produces on every valid pixel — for the
canonical tail, the LR-domain tail, and all scale factors — because norm
statistics reduce over the valid region only and padding is re-zeroed after
every bias/norm (so it only ever supplies the zeros that the true image
edge's conv zero-padding would).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_srgan_tpu.inference import SRInferenceEngine
from fast_srgan_tpu.models import Generator
from fast_srgan_tpu.ops.lr_tail import generator_apply_lr_tail
from fast_srgan_tpu.ops.norm import (
    instance_norm_masked_nhwc,
    instance_norm_nhwc,
    valid_mask_nhwc,
)


from conftest import perturbed_init as _perturbed_init


class TestMaskedNorm:
    def test_matches_cropped_norm(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16, 4))
        vh = jnp.array([7, 12], jnp.int32)
        vw = jnp.array([16, 9], jnp.int32)
        mask, count = valid_mask_nhwc(12, 16, vh, vw)
        got = instance_norm_masked_nhwc(x * mask, mask, count)
        for b in range(2):
            h, w = int(vh[b]), int(vw[b])
            want = instance_norm_nhwc(x[b: b + 1, :h, :w])
            np.testing.assert_allclose(
                np.asarray(got[b, :h, :w]), np.asarray(want[0]),
                atol=1e-5,
            )
            # padding stays exactly zero
            assert float(jnp.abs(got[b, h:]).max() if h < 12 else 0) == 0
            assert float(jnp.abs(got[b, :, w:]).max() if w < 16 else 0) == 0


class TestMaskedGenerator:
    @pytest.mark.parametrize("scale", [2, 4, 8])
    def test_padded_masked_equals_unpadded(self, scale):
        model = Generator(
            n_filters=16, n_layers=2, dtype=jnp.float32, scale_factor=scale
        )
        h, w, ph, pw = 11, 14, 16, 16
        x = jax.random.uniform(
            jax.random.PRNGKey(7), (1, h, w, 3), minval=-1, maxval=1
        )
        v = _perturbed_init(model, x)
        want = model.apply(v, x)
        xp = jnp.pad(x, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
        valid = (jnp.array([h], jnp.int32), jnp.array([w], jnp.int32))
        got = model.apply(v, xp, valid_hw=valid)
        np.testing.assert_allclose(
            np.asarray(got[:, : h * scale, : w * scale]),
            np.asarray(want), atol=2e-5,
        )

    def test_mixed_valid_sizes_in_one_batch(self):
        model = Generator(n_filters=16, n_layers=1, dtype=jnp.float32)
        shapes = [(9, 12), (16, 16), (5, 7)]
        v = _perturbed_init(model, jnp.zeros((1, 16, 16, 3)))
        xs, singles = [], []
        for i, (h, w) in enumerate(shapes):
            x = jax.random.uniform(
                jax.random.PRNGKey(i), (1, h, w, 3), minval=-1, maxval=1
            )
            singles.append(model.apply(v, x))
            xs.append(jnp.pad(x[0], ((0, 16 - h), (0, 16 - w), (0, 0))))
        batch = jnp.stack(xs)
        valid = (
            jnp.array([s[0] for s in shapes], jnp.int32),
            jnp.array([s[1] for s in shapes], jnp.int32),
        )
        got = model.apply(v, batch, valid_hw=valid)
        for b, (h, w) in enumerate(shapes):
            np.testing.assert_allclose(
                np.asarray(got[b, : h * 4, : w * 4]),
                np.asarray(singles[b][0]), atol=2e-5,
            )

    def test_lr_tail_masked_matches(self):
        model = Generator(n_filters=16, n_layers=1, dtype=jnp.float32)
        h, w = 10, 13
        x = jax.random.uniform(
            jax.random.PRNGKey(2), (1, h, w, 3), minval=-1, maxval=1
        )
        v = _perturbed_init(model, x)
        want = model.apply(v, x)
        xp = jnp.pad(x, ((0, 0), (0, 6), (0, 3), (0, 0)))
        valid = (jnp.array([h], jnp.int32), jnp.array([w], jnp.int32))
        got = generator_apply_lr_tail(model, v, xp, valid_hw=valid)
        np.testing.assert_allclose(
            np.asarray(got[:, : h * 4, : w * 4]), np.asarray(want), atol=2e-5
        )


class TestBucketedEngine:
    def test_bucketed_equals_exact(self, rng):
        model = Generator(n_filters=8, n_layers=2)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        kw = dict(n_filters=8, n_layers=2, dtype=jnp.float32)
        exact = SRInferenceEngine(params, **kw)
        bucketed = SRInferenceEngine(params, bucket=16, **kw)
        batch = rng.integers(0, 256, (2, 12, 20, 3), dtype=np.uint8)
        a = exact.upscale_batch(batch)
        b = bucketed.upscale_batch(batch)
        assert a.shape == b.shape == (2, 48, 80, 3)
        # separately-compiled programs: last-bit uint8 rounding tolerance
        assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1

    def test_mixed_shapes_share_bucket_batch(self, rng):
        model = Generator(n_filters=8, n_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        kw = dict(n_filters=8, n_layers=1, dtype=jnp.float32)
        exact = SRInferenceEngine(params, **kw)
        bucketed = SRInferenceEngine(params, bucket=16, **kw)
        images = [
            rng.integers(0, 256, (10, 12, 3), dtype=np.uint8),
            rng.integers(0, 256, (8, 8, 3), dtype=np.uint8),
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
        ]
        outs = bucketed.upscale_images(images, batch_size=3)
        assert [o.shape for o in outs] == [
            (40, 48, 3), (32, 32, 3), (64, 64, 3),
        ]
        for im, out in zip(images, outs):
            want = exact.upscale_batch(im[None])[0]
            assert np.abs(
                out.astype(np.int16) - want.astype(np.int16)
            ).max() <= 1

    def test_pallas_plus_bucket_rejected(self):
        model = Generator(n_filters=8, n_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        with pytest.raises(ValueError, match="Pallas"):
            SRInferenceEngine(
                params, n_filters=8, n_layers=1, bucket=16, use_pallas=True
            )


class TestBucketedMeshEngine:
    def test_masked_program_shards_over_mesh(self, rng):
        from fast_srgan_tpu.parallel.mesh import make_mesh

        model = Generator(n_filters=8, n_layers=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
        kw = dict(n_filters=8, n_layers=1, dtype=jnp.float32)
        single = SRInferenceEngine(params, **kw)
        sharded = SRInferenceEngine(
            params, bucket=16, mesh=make_mesh(8), **kw
        )
        batch = rng.integers(0, 256, (8, 10, 13, 3), dtype=np.uint8)
        a = single.upscale_batch(batch)
        b = sharded.upscale_batch(batch)
        assert a.shape == b.shape == (8, 40, 52, 3)
        assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1
