"""Exactness of the LR-domain upsampling tail (ops/lr_tail.py).

The transform is pure kernel rearrangement, so fp32 outputs must match the
canonical Generator forward to float-reassociation tolerance on arbitrary
shapes (including odd H/W) and filter counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_srgan_tpu.models import Generator
from fast_srgan_tpu.ops.lr_tail import generator_apply_lr_tail, lr_tail


from conftest import perturbed_init as _perturbed_init


class TestLRTailExactness:
    @pytest.mark.parametrize(
        "h,w,n_filters,n_layers",
        [(24, 24, 64, 2), (17, 23, 32, 1), (24, 40, 64, 3), (5, 7, 16, 1)],
    )
    def test_matches_canonical_fp32(self, h, w, n_filters, n_layers):
        model = Generator(
            n_filters=n_filters, n_layers=n_layers, dtype=jnp.float32
        )
        x = jax.random.uniform(
            jax.random.PRNGKey(h * w), (2, h, w, 3), minval=-1, maxval=1
        )
        v = _perturbed_init(model, x)
        ref = model.apply(v, x)
        got = generator_apply_lr_tail(model, v, x)
        assert got.shape == ref.shape == (2, 4 * h, 4 * w, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    @pytest.mark.skipif(
        not __import__("os").path.exists("/root/reference/models/model.pt"),
        reason="reference checkpoint not mounted",
    )
    def test_pretrained_checkpoint_agrees(self):
        from fast_srgan_tpu.checkpoints.torch_compat import (
            load_reference_generator_params,
        )

        params = load_reference_generator_params(
            "/root/reference/models/model.pt"
        )
        model = Generator(n_filters=64, n_layers=8, dtype=jnp.float32)
        x = jax.random.uniform(
            jax.random.PRNGKey(3), (1, 32, 48, 3), minval=-1, maxval=1
        )
        ref = model.apply(params, x)
        got = generator_apply_lr_tail(model, params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize(
        "h,w,n_filters,n_layers",
        [(24, 24, 32, 2), (9, 13, 16, 1)],
    )
    def test_2x_matches_canonical_fp32(self, h, w, n_filters, n_layers):
        model = Generator(
            n_filters=n_filters, n_layers=n_layers, scale_factor=2,
            dtype=jnp.float32,
        )
        x = jax.random.uniform(
            jax.random.PRNGKey(h + w), (2, h, w, 3), minval=-1, maxval=1
        )
        v = _perturbed_init(model, x)
        ref = model.apply(v, x)
        got = generator_apply_lr_tail(model, v, x)
        assert got.shape == ref.shape == (2, 2 * h, 2 * w, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_2x_masked_matches_canonical(self):
        model = Generator(n_filters=16, n_layers=1, scale_factor=2,
                          dtype=jnp.float32)
        x = jax.random.uniform(
            jax.random.PRNGKey(7), (2, 12, 12, 3), minval=-1, maxval=1
        )
        v = _perturbed_init(model, x)
        vh = jnp.array([12, 9], jnp.int32)
        vw = jnp.array([12, 10], jnp.int32)
        from fast_srgan_tpu.ops.norm import valid_mask_nhwc

        mask, _ = valid_mask_nhwc(12, 12, vh, vw)
        ref = model.apply(v, x * mask, valid_hw=(vh, vw))
        got = generator_apply_lr_tail(model, v, x * mask, valid_hw=(vh, vw))
        for b, (h, w) in enumerate([(12, 12), (9, 10)]):
            np.testing.assert_allclose(
                np.asarray(got)[b, : 2 * h, : 2 * w],
                np.asarray(ref)[b, : 2 * h, : 2 * w],
                atol=2e-5,
            )

    @pytest.mark.parametrize("h,w", [(12, 12), (7, 9)])
    def test_8x_matches_canonical_fp32(self, h, w):
        model = Generator(
            n_filters=16, n_layers=1, scale_factor=8, dtype=jnp.float32
        )
        x = jax.random.uniform(
            jax.random.PRNGKey(h - w), (2, h, w, 3), minval=-1, maxval=1
        )
        v = _perturbed_init(model, x)
        ref = model.apply(v, x)
        got = generator_apply_lr_tail(model, v, x)
        assert got.shape == ref.shape == (2, 8 * h, 8 * w, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_8x_masked_matches_canonical(self):
        model = Generator(n_filters=16, n_layers=1, scale_factor=8,
                          dtype=jnp.float32)
        x = jax.random.uniform(
            jax.random.PRNGKey(11), (2, 10, 10, 3), minval=-1, maxval=1
        )
        v = _perturbed_init(model, x)
        vh = jnp.array([10, 7], jnp.int32)
        vw = jnp.array([10, 8], jnp.int32)
        from fast_srgan_tpu.ops.norm import valid_mask_nhwc

        mask, _ = valid_mask_nhwc(10, 10, vh, vw)
        ref = model.apply(v, x * mask, valid_hw=(vh, vw))
        got = generator_apply_lr_tail(model, v, x * mask, valid_hw=(vh, vw))
        for b, (h, w) in enumerate([(10, 10), (7, 8)]):
            np.testing.assert_allclose(
                np.asarray(got)[b, : 8 * h, : 8 * w],
                np.asarray(ref)[b, : 8 * h, : 8 * w],
                atol=2e-5,
            )

    def test_rejects_unsupported_scale(self):
        # the guard fires before any apply, so no params are needed
        model = Generator(n_filters=16, n_layers=1, scale_factor=3)
        with pytest.raises(ValueError, match="scale_factor 2, 4, or 8"):
            generator_apply_lr_tail(model, {}, jnp.zeros((1, 8, 8, 3)))

    def test_trunk_only_is_prefix_of_full(self):
        """trunk_only returns the LR feature map the tail consumes, and the
        canonical tail on it reproduces the full forward."""
        model = Generator(n_filters=16, n_layers=1, dtype=jnp.float32)
        x = jax.random.uniform(
            jax.random.PRNGKey(5), (1, 9, 11, 3), minval=-1, maxval=1
        )
        v = _perturbed_init(model, x)
        y = model.apply(v, x, trunk_only=True)
        assert y.shape == (1, 9, 11, 16)
        got = lr_tail(y, v["params"], dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(model.apply(v, x)), atol=2e-5
        )


class TestHeadPolicy:
    """The measured per-shape-class 4x head form (head_form_4x): summed by
    default, concat at memory-capped streaming batches (>=2 frames of
    >=4K-class LR pixels). Both forms exact vs the canonical graph."""

    def test_policy_table(self):
        from fast_srgan_tpu.ops.lr_tail import (
            CONCAT_HEAD_MIN_PIXELS,
            head_form_4x,
        )

        assert head_form_4x(128, 180 * 320) == "summed"  # 720p stream
        assert head_form_4x(512, 90 * 160) == "summed"  # 360p stream
        assert head_form_4x(1, 540 * 960) == "summed"  # 4K latency (b1)
        assert head_form_4x(8, 540 * 960) == "concat"  # 4K stream
        assert head_form_4x(2, CONCAT_HEAD_MIN_PIXELS) == "concat"

    @pytest.mark.parametrize("head", ["summed", "concat"])
    def test_both_forms_match_canonical(self, head):
        model = Generator(n_filters=16, n_layers=1, dtype=jnp.float32)
        x = jax.random.uniform(
            jax.random.PRNGKey(9), (2, 11, 13, 3), minval=-1, maxval=1
        )
        v = _perturbed_init(model, x)
        ref = model.apply(v, x)
        y = model.apply(v, x, trunk_only=True)
        got = lr_tail(y, v["params"], dtype=jnp.float32, head=head)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5
        )

    def test_concat_masked_matches_crop(self):
        """The concat form's masked path must stay bucketed-exact."""
        model = Generator(n_filters=16, n_layers=1, dtype=jnp.float32)
        xp = jax.random.uniform(
            jax.random.PRNGKey(11), (1, 12, 16, 3), minval=-1, maxval=1
        )
        vh, vw = 9, 13
        xp = xp.at[:, vh:, :, :].set(0.0).at[:, :, vw:, :].set(0.0)
        v = _perturbed_init(model, xp)
        ref = model.apply(v, xp[:, :vh, :vw, :])

        from fast_srgan_tpu.ops.norm import valid_mask_nhwc

        vhs = jnp.asarray([vh], jnp.int32)
        vws = jnp.asarray([vw], jnp.int32)
        y = model.apply(v, xp, trunk_only=True, valid_hw=(vhs, vws))
        mask, _ = valid_mask_nhwc(y.shape[1], y.shape[2], vhs, vws)
        got = lr_tail(
            y, v["params"], dtype=jnp.float32, mask=mask, head="concat"
        )
        np.testing.assert_allclose(
            np.asarray(got[:, : 4 * vh, : 4 * vw, :]),
            np.asarray(ref),
            atol=2e-5,
        )

    def test_policy_sees_per_device_batch(self, monkeypatch):
        """Under a data mesh the engine passes batch_divisor=mesh.size:
        the policy must key on per-device batch (a global batch-8 4K
        program on 8 chips is one frame per chip — the summed-head
        latency class, not the memory-capped streaming class)."""
        import fast_srgan_tpu.ops.lr_tail as lt

        seen = []
        real = lt.head_form_4x

        def spy(batch, px):
            seen.append((batch, px))
            return real(batch, px)

        monkeypatch.setattr(lt, "head_form_4x", spy)
        model = Generator(n_filters=8, n_layers=1, dtype=jnp.float32)
        x = jnp.zeros((8, 8, 8, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        lt.generator_apply_lr_tail(model, v, x, batch_divisor=8)
        assert seen == [(1, 64)]
        seen.clear()
        lt.generator_apply_lr_tail(model, v, x)  # single device
        assert seen == [(8, 64)]

    def test_rejects_bad_head(self):
        model = Generator(n_filters=16, n_layers=1, dtype=jnp.float32)
        x = jnp.zeros((1, 8, 8, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(v, x, trunk_only=True)
        with pytest.raises(ValueError, match="head must be"):
            lr_tail(y, v["params"], head="dense")
