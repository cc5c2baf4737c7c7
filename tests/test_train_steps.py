"""Train-step smoke + behavior tests (small models, synthetic data)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_srgan_tpu.config import default_config
from fast_srgan_tpu.parallel.mesh import make_mesh, shard_batch
from fast_srgan_tpu.train.steps import build_bundle, prepare_batch


def tiny_config(**training):
    return default_config(
        data={"lr_image_size": 8, "scale_factor": 4},
        generator={"n_filters": 8, "n_layers": 2},
        discriminator={"n_filters": 8},
        training={"bf16": False, "vgg_weights": "pixel", **training},
    )


def synthetic_batch(rng, batch=4, hr=32):
    return rng.integers(0, 256, size=(batch, hr, hr, 3), dtype=np.uint8)


class TestPrepareBatch:
    def test_ranges_and_shapes(self, rng):
        hr_u8 = jnp.asarray(synthetic_batch(rng))
        lr, hr = prepare_batch(hr_u8, 8)
        assert lr.shape == (4, 8, 8, 3) and hr.shape == (4, 32, 32, 3)
        assert float(hr.min()) >= -1.0 and float(hr.max()) <= 1.0


class TestPretrainStep:
    def test_loss_decreases(self, rng):
        config = tiny_config()
        bundle, g_state, _, _ = build_bundle(config)
        batch = jnp.asarray(synthetic_batch(rng))
        losses = []
        for _ in range(8):
            g_state, loss = bundle.pretrain_step(g_state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        assert g_state.step == 8


class TestGanStep:
    def test_updates_both_states_and_reports_metrics(self, rng):
        config = tiny_config()
        bundle, g_state, d_state, vgg_params = build_bundle(config)
        batch = jnp.asarray(synthetic_batch(rng))
        g0 = jax.tree.map(lambda x: x.copy(), g_state.params)
        d0 = jax.tree.map(lambda x: x.copy(), d_state.params)
        key = jax.random.key(0)
        g_state, d_state, metrics = bundle.gan_step(
            g_state, d_state, vgg_params, batch, key
        )
        assert set(metrics) == {
            "d_loss", "loss_real", "loss_fake", "g_loss", "adv_loss",
            "content_loss",
        }
        for v in metrics.values():
            assert np.isfinite(float(v))
        changed_g = jax.tree.leaves(
            jax.tree.map(lambda a, b: bool((a != b).any()), g0, g_state.params)
        )
        changed_d = jax.tree.leaves(
            jax.tree.map(lambda a, b: bool((a != b).any()), d0, d_state.params)
        )
        assert any(changed_g) and any(changed_d)

    def test_vgg_init_sentinel_uses_feature_loss(self, rng):
        # training.vgg_weights="init": the VGG-features content loss runs
        # with fixed-seed weights (the reference loss formulation's full
        # compute, for profiling) instead of the pixel-space fallback.
        batch = jnp.asarray(synthetic_batch(rng))
        key = jax.random.key(3)

        config = tiny_config(vgg_weights="init")
        bundle, g_state, d_state, vgg_params = build_bundle(config)
        _, _, m_vgg = bundle.gan_step(
            g_state, d_state, vgg_params, batch, key
        )

        config2 = tiny_config()
        bundle2, g_state2, d_state2, vgg_params2 = build_bundle(config2)
        _, _, m_pix = bundle2.gan_step(
            g_state2, d_state2, vgg_params2, batch, key
        )

        for v in m_vgg.values():
            assert np.isfinite(float(v))
        # same models/key, different content objective
        assert float(m_vgg["content_loss"]) != pytest.approx(
            float(m_pix["content_loss"])
        )

    @pytest.mark.parametrize("vgg_mode", ["pixel", "init"])
    def test_shared_forward_matches_recompute(self, rng, vgg_mode):
        # The default shared-forward GAN step (one G forward, jax.vjp
        # pullback) must be mathematically identical to the reference's
        # recompute form: same losses AND same updated parameters.
        batch = jnp.asarray(synthetic_batch(rng))
        key = jax.random.key(11)
        results = []
        for shared in (True, False):
            config = tiny_config(
                vgg_weights=vgg_mode, gan_shared_forward=shared
            )
            bundle, g_state, d_state, vgg_params = build_bundle(config)
            g_state, d_state, metrics = bundle.gan_step(
                g_state, d_state, vgg_params, batch, key
            )
            results.append((g_state, d_state, metrics))
        (g_a, d_a, m_a), (g_b, d_b, m_b) = results
        for k in m_a:
            assert float(m_a[k]) == pytest.approx(
                float(m_b[k]), rel=1e-5, abs=1e-7
            ), k
        for name, (ta, tb) in {
            "g_params": (g_a.params, g_b.params),
            "d_params": (d_a.params, d_b.params),
        }.items():
            err = max(
                jax.tree.leaves(
                    jax.tree.map(
                        lambda a, b: float(jnp.abs(a - b).max()), ta, tb
                    )
                )
            )
            assert err < 1e-5, (name, err)

    def test_remat_vgg_matches(self, rng):
        # training.remat_vgg changes only the backward's memory/recompute
        # schedule, never the math.
        batch = jnp.asarray(synthetic_batch(rng))
        key = jax.random.key(13)
        outs = []
        for remat in (False, True):
            config = tiny_config(vgg_weights="init", remat_vgg=remat)
            bundle, g_state, d_state, vgg_params = build_bundle(config)
            g_state, _, metrics = bundle.gan_step(
                g_state, d_state, vgg_params, batch, key
            )
            outs.append((g_state.params, metrics))
        err = max(
            jax.tree.leaves(
                jax.tree.map(
                    lambda a, b: float(jnp.abs(a - b).max()),
                    outs[0][0], outs[1][0],
                )
            )
        )
        assert err < 1e-6, err
        assert float(outs[0][1]["g_loss"]) == pytest.approx(
            float(outs[1][1]["g_loss"]), rel=1e-6
        )

    def test_vgg_concat_matches(self, rng):
        # training.vgg_concat fuses VGG(sr) and VGG(hr) into one 2B-batch
        # forward. VGG is batch-independent (convs/relus/pools only), so
        # losses and updated params must match the two-call form.
        batch = jnp.asarray(synthetic_batch(rng))
        key = jax.random.key(17)
        outs = []
        for concat in (False, True):
            config = tiny_config(vgg_weights="init", vgg_concat=concat)
            bundle, g_state, d_state, vgg_params = build_bundle(config)
            g_state, d_state, metrics = bundle.gan_step(
                g_state, d_state, vgg_params, batch, key
            )
            outs.append((g_state.params, d_state.params, metrics))
        for k in outs[0][2]:
            assert float(outs[0][2][k]) == pytest.approx(
                float(outs[1][2][k]), rel=1e-5, abs=1e-7
            ), k
        for idx, name in ((0, "g_params"), (1, "d_params")):
            err = max(
                jax.tree.leaves(
                    jax.tree.map(
                        lambda a, b: float(jnp.abs(a - b).max()),
                        outs[0][idx], outs[1][idx],
                    )
                )
            )
            assert err < 1e-5, (name, err)

    def test_deterministic_given_key(self, rng):
        config = tiny_config()
        batch = jnp.asarray(synthetic_batch(rng))
        outs = []
        for _ in range(2):
            bundle, g_state, d_state, vgg_params = build_bundle(config)
            g_state, d_state, metrics = bundle.gan_step(
                g_state, d_state, vgg_params, batch, jax.random.key(7)
            )
            outs.append(float(metrics["g_loss"]))
        assert outs[0] == outs[1]


class TestEvalStep:
    def test_psnr_ssim_statistics(self, rng):
        config = tiny_config()
        bundle, g_state, _, _ = build_bundle(config)
        batch = jnp.asarray(synthetic_batch(rng))
        ones = jnp.ones(4, jnp.float32)
        sse, ssim, count = bundle.eval_step(g_state.params, batch, ones)
        assert sse.shape == () and ssim.shape == ()
        assert float(sse) > 0.0
        assert float(count) == 4.0
        assert -4.0 <= float(ssim) <= 4.0

    def test_padding_mask_excludes_rows(self, rng):
        # masked-out rows must not contribute: stats over [b, pad] with
        # mask [1, 0] == stats over [b] alone
        config = tiny_config()
        bundle, g_state, _, _ = build_bundle(config)
        real = synthetic_batch(rng, batch=1)
        padded = np.concatenate([real, synthetic_batch(rng, batch=1)])
        s1, ss1, c1 = bundle.eval_step(
            g_state.params, jnp.asarray(padded),
            jnp.asarray([1.0, 0.0], jnp.float32),
        )
        s2, ss2, c2 = bundle.eval_step(
            g_state.params, jnp.asarray(real.repeat(2, 0)),
            jnp.asarray([1.0, 0.0], jnp.float32),
        )
        assert float(c1) == float(c2) == 1.0
        np.testing.assert_allclose(float(s1), float(s2), rtol=1e-6)
        np.testing.assert_allclose(float(ss1), float(ss2), rtol=1e-6)


class TestDataParallel:
    """The multi-chip path on the virtual 8-device CPU mesh (SURVEY.md §4)."""

    def test_gan_step_on_mesh_matches_single_device(self):
        # Own fixed rng (not the session fixture): this test's fp32-tolerance
        # comparisons are content-sensitive, and the shared stream's state
        # depends on which tests ran before — a marginal batch must fail
        # reproducibly, not only under one suite ordering.
        config = tiny_config()
        batch_np = synthetic_batch(np.random.default_rng(1234), batch=8)

        bundle1, g1, d1, v1 = build_bundle(config)
        g1, d1, m1 = bundle1.gan_step(g1, d1, v1, jnp.asarray(batch_np), jax.random.key(3))

        mesh = make_mesh(8)
        bundle8, g8, d8, v8 = build_bundle(config, mesh=mesh)
        sharded = shard_batch(batch_np, mesh)
        g8, d8, m8 = bundle8.gan_step(g8, d8, v8, sharded, jax.random.key(3))

        # Same math, different partitioning: losses agree to fp32 tolerance.
        np.testing.assert_allclose(
            float(m1["g_loss"]), float(m8["g_loss"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            float(m1["d_loss"]), float(m8["d_loss"]), rtol=2e-5
        )
        # Updated params agree across the partitioning too.
        a = jax.tree.leaves(g1.params)[0]
        b = jax.tree.leaves(g8.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_pretrain_step_on_mesh(self, rng):
        config = tiny_config()
        mesh = make_mesh(8)
        bundle, g_state, _, _ = build_bundle(config, mesh=mesh)
        batch = shard_batch(synthetic_batch(rng, batch=8), mesh)
        g_state, loss = bundle.pretrain_step(g_state, batch)
        assert np.isfinite(float(loss))


class TestGradAccum:
    """training.grad_accum=k: scan over k micro-batches, one update."""

    def test_pretrain_accum_matches_single_batch(self, rng):
        # No RNG in the pretrain loss -> the accumulated gradient equals
        # the one-big-batch gradient up to fp32 reassociation (mean of
        # per-micro means vs one global mean).
        batch = jnp.asarray(synthetic_batch(rng, batch=8))

        bundle1, g1, _, _ = build_bundle(tiny_config())
        g1, loss1 = bundle1.pretrain_step(g1, batch)

        bundle4, g4, _, _ = build_bundle(tiny_config(grad_accum=4))
        g4, loss4 = bundle4.pretrain_step(g4, batch)

        assert float(loss4) == pytest.approx(float(loss1), rel=1e-5)
        for a, b in zip(
            jax.tree.leaves(g1.params), jax.tree.leaves(g4.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )

    def test_gan_accum_updates_and_is_deterministic(self, rng):
        config = tiny_config(grad_accum=2)
        bundle, g_state, d_state, vgg_params = build_bundle(config)
        batch = jnp.asarray(synthetic_batch(rng, batch=4))
        key = jax.random.key(5)
        g1, d1, m1 = bundle.gan_step(g_state, d_state, vgg_params, batch, key)
        for v in m1.values():
            assert np.isfinite(float(v))

        bundle2, g_state2, d_state2, vgg_params2 = build_bundle(config)
        g2, d2, m2 = bundle2.gan_step(
            g_state2, d_state2, vgg_params2, batch, key
        )
        assert float(m1["g_loss"]) == pytest.approx(float(m2["g_loss"]))
        for a, b in zip(jax.tree.leaves(g1.params), jax.tree.leaves(g2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_indivisible_batch_rejected(self, rng):
        bundle, g_state, _, _ = build_bundle(tiny_config(grad_accum=3))
        with pytest.raises(ValueError, match="not divisible"):
            bundle.pretrain_step(g_state, jnp.asarray(synthetic_batch(rng, batch=4)))


class TestEma:
    """training.ema_decay: in-jit generator weight EMA (steps.py)."""

    def test_pretrain_ema_is_exact_lerp_and_params_unchanged(self, rng):
        d = 0.75
        bundle_e, gs_e, _, _ = build_bundle(tiny_config(ema_decay=d))
        bundle_r, gs_r, _, _ = build_bundle(tiny_config())
        batch = jnp.asarray(synthetic_batch(rng))

        def host(tree):  # snapshot before donation invalidates the buffers
            return jax.tree.map(lambda x: np.asarray(x).copy(), tree)

        p_hist = [host(gs_r.params)]
        for _ in range(3):
            gs_r, _ = bundle_r.pretrain_step(gs_r, batch)
            p_hist.append(host(gs_r.params))
        expected = p_hist[0]
        for p in p_hist[1:]:
            expected = jax.tree.map(
                lambda e, q: d * e + (1 - d) * q, expected, p
            )
        for _ in range(3):
            gs_e, _ = bundle_e.pretrain_step(gs_e, batch)
        # EMA must not perturb the training trajectory itself
        for a, b in zip(
            jax.tree.leaves(gs_e.params), jax.tree.leaves(p_hist[-1])
        ):
            np.testing.assert_array_equal(np.asarray(a), b)
        for a, b in zip(
            jax.tree.leaves(gs_e.ema_params), jax.tree.leaves(expected)
        ):
            np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)

    def test_gan_shared_and_recompute_agree_on_ema(self, rng):
        batch = jnp.asarray(synthetic_batch(rng))
        key = jax.random.key(3)
        results = []
        for shared in (True, False):
            bundle, gs, ds, vp = build_bundle(
                tiny_config(ema_decay=0.9, gan_shared_forward=shared)
            )
            gs, ds, _ = bundle.gan_step(gs, ds, vp, batch, key)
            gs, ds, _ = bundle.gan_step(
                gs, ds, vp, batch, jax.random.fold_in(key, 1)
            )
            results.append(gs)
        a, b = results
        for x, y in zip(
            jax.tree.leaves(a.ema_params), jax.tree.leaves(b.ema_params)
        ):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=1e-5
            )
        # the average lags the raw params (they must differ after updates)
        diffs = [
            float(np.abs(np.asarray(x) - np.asarray(y)).max())
            for x, y in zip(
                jax.tree.leaves(a.ema_params), jax.tree.leaves(a.params)
            )
        ]
        assert max(diffs) > 0

    def test_disabled_by_default(self, rng):
        bundle, gs, ds, vp = build_bundle(tiny_config())
        assert gs.ema_params is None
        gs, _, _ = bundle.gan_step(
            gs, ds, vp, jnp.asarray(synthetic_batch(rng)), jax.random.key(0)
        )
        assert gs.ema_params is None

    def test_ema_on_8_device_mesh_matches_single_device(self):
        """EMA tree rides the replicated state sharding + donation."""
        config = tiny_config(ema_decay=0.9)
        batch_np = synthetic_batch(np.random.default_rng(77), batch=8)
        key = jax.random.key(5)

        bundle1, g1, d1, v1 = build_bundle(config)
        g1, d1, _ = bundle1.gan_step(g1, d1, v1, jnp.asarray(batch_np), key)

        mesh = make_mesh(8)
        bundle8, g8, d8, v8 = build_bundle(config, mesh=mesh)
        g8, d8, _ = bundle8.gan_step(
            g8, d8, v8, shard_batch(batch_np, mesh), key
        )

        for a, b in zip(
            jax.tree.leaves(g1.ema_params), jax.tree.leaves(g8.ema_params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )


class TestLrSchedule:
    """training.lr_schedule: step/cosine decay (constant = reference)."""

    def test_step_decay_to_zero_freezes_updates(self, rng):
        # factor 0 at milestone 1: the 1st update applies, the 2nd is a
        # no-op (optax adamw scales weight decay by lr too) — an exact
        # signature of the milestone firing at the right count.
        # pretrain_iterations=0: milestones count GAN-phase G updates (the
        # schedule holds the base lr through pretrain), so zeroing the
        # offset lets pretrain_step drive the schedule directly.
        bundle, gs, _, _ = build_bundle(
            tiny_config(lr_schedule="step", lr_decay_steps=[1],
                        lr_decay_factor=0.0, pretrain_iterations=0)
        )
        batch = jnp.asarray(synthetic_batch(rng))
        gs, _ = bundle.pretrain_step(gs, batch)
        after_1 = [np.asarray(x).copy() for x in jax.tree.leaves(gs.params)]
        gs, _ = bundle.pretrain_step(gs, batch)
        for a, b in zip(after_1, jax.tree.leaves(gs.params)):
            np.testing.assert_array_equal(a, np.asarray(b))

    def test_cosine_differs_from_constant_but_still_trains(self, rng):
        batch = jnp.asarray(synthetic_batch(rng))
        leaves = []
        for cfg in (
            tiny_config(lr_schedule="cosine", pretrain_iterations=0,
                        iterations=3),
            tiny_config(pretrain_iterations=0, iterations=3),
        ):
            bundle, gs, _, _ = build_bundle(cfg)
            for _ in range(3):
                gs, loss = bundle.pretrain_step(gs, batch)
            assert np.isfinite(float(loss))
            leaves.append([np.asarray(x) for x in jax.tree.leaves(gs.params)])
        assert any(
            np.abs(a - b).max() > 0 for a, b in zip(leaves[0], leaves[1])
        )

    def test_unknown_schedule_rejected(self):
        with pytest.raises(ValueError, match="lr_schedule"):
            build_bundle(tiny_config(lr_schedule="linear"))

    def test_torch_optimizer_export_with_schedule(self, rng):
        # the AdamW moments live deeper in the chain with a schedule state
        # present; the exporter must still find them.
        from fast_srgan_tpu.checkpoints.torch_compat import (
            generator_optimizer_to_torch_state_dict,
        )

        config = tiny_config(lr_schedule="cosine")
        bundle, gs, _, _ = build_bundle(config)
        gs, _ = bundle.pretrain_step(gs, jnp.asarray(synthetic_batch(rng)))
        sd = generator_optimizer_to_torch_state_dict(
            jax.device_get(gs.opt_state),
            n_layers=config.generator.n_layers, lr=1e-4, n_up=2,
        )
        assert sd["param_groups"][0]["lr"] == 1e-4


class TestGradClip:
    """training.grad_clip: global-norm clipping ahead of AdamW."""

    def test_huge_clip_is_exact_noop(self, rng):
        batch = jnp.asarray(synthetic_batch(rng))
        leaves = []
        for cfg in (tiny_config(grad_clip=1e9), tiny_config()):
            bundle, gs, _, _ = build_bundle(cfg)
            gs, _ = bundle.pretrain_step(gs, batch)
            leaves.append([np.asarray(x) for x in jax.tree.leaves(gs.params)])
        for a, b in zip(*leaves):
            np.testing.assert_array_equal(a, b)

    def test_clip_changes_updates_and_is_finite(self, rng):
        batch = jnp.asarray(synthetic_batch(rng))
        bundle, gs, ds, vp = build_bundle(tiny_config(grad_clip=1e-3))
        gs, ds, m = bundle.gan_step(gs, ds, vp, batch, jax.random.key(1))
        for v in m.values():
            assert np.isfinite(float(v))

    def test_torch_optimizer_roundtrip_with_clip(self, rng):
        # the AdamW moments nest one level deeper under the clip chain;
        # exporter and importer must traverse it (torch_compat recursion).
        from fast_srgan_tpu.checkpoints.torch_compat import (
            _adam_state,
            generator_optimizer_from_torch_state_dict,
            generator_optimizer_to_torch_state_dict,
        )

        config = tiny_config(grad_clip=0.5)
        bundle, gs, _, _ = build_bundle(config)
        gs, _ = bundle.pretrain_step(gs, jnp.asarray(synthetic_batch(rng)))
        host_state = jax.device_get(gs.opt_state)
        sd = generator_optimizer_to_torch_state_dict(
            host_state, n_layers=config.generator.n_layers, lr=1e-4, n_up=2
        )
        restored = generator_optimizer_from_torch_state_dict(
            sd, host_state, n_layers=config.generator.n_layers, n_up=2
        )
        a, b = _adam_state(host_state), _adam_state(restored)
        assert int(a.count) == int(b.count) == 1
        for x, y in zip(jax.tree.leaves(a.mu), jax.tree.leaves(b.mu)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def _schedule_counts(opt_state):
    """All pure step counters (schedule states) in a chain state."""
    out = []

    def walk(part):
        if (
            hasattr(part, "_fields") and "count" in part._fields
            and not hasattr(part, "mu")
        ):
            out.append(int(part.count))
        elif isinstance(part, tuple) and not hasattr(part, "_fields"):
            for p in part:
                walk(p)

    walk(opt_state)
    return out


class TestScheduleWarmStart:
    def test_torch_roundtrip_restores_schedule_position(self, rng):
        # A torch warm-start must not silently restart the decay: every
        # schedule counter in the chain is synced to the torch step count.
        from fast_srgan_tpu.checkpoints.torch_compat import (
            generator_optimizer_from_torch_state_dict,
            generator_optimizer_to_torch_state_dict,
        )

        config = tiny_config(lr_schedule="cosine")
        bundle, gs, _, _ = build_bundle(config)
        batch = jnp.asarray(synthetic_batch(rng))
        for _ in range(3):
            gs, _ = bundle.pretrain_step(gs, batch)
        host = jax.device_get(gs.opt_state)
        assert _schedule_counts(host) and all(
            c == 3 for c in _schedule_counts(host)
        )
        sd = generator_optimizer_to_torch_state_dict(
            host, n_layers=config.generator.n_layers, lr=1e-4, n_up=2
        )
        # import into a FRESH (count-0) like state, as a warm start would
        _, fresh_gs, _, _ = build_bundle(config)
        restored = generator_optimizer_from_torch_state_dict(
            sd, jax.device_get(fresh_gs.opt_state),
            n_layers=config.generator.n_layers, n_up=2,
        )
        assert all(c == 3 for c in _schedule_counts(restored)), (
            _schedule_counts(restored)
        )


class TestScheduleAlignment:
    def test_g_and_d_decay_at_the_same_gan_step(self):
        # G's optimizer count includes pretrain updates; the schedule must
        # shift past them so both nets hit milestones at the same GAN step.
        from fast_srgan_tpu.train.steps import make_lr_schedule

        cfg = tiny_config(
            lr_schedule="step", lr_decay_steps=[5], lr_decay_factor=0.5,
        )
        g = make_lr_schedule(cfg, 1e-4, 20, pretrain_offset=7)
        d = make_lr_schedule(cfg, 1e-4, 20)
        for count in range(7):  # pretrain G updates run at the base lr
            assert float(g(count)) == pytest.approx(1e-4)
        for gan_count in (0, 4, 5, 6, 19):
            assert float(g(7 + gan_count)) == pytest.approx(
                float(d(gan_count))
            )
        assert float(d(5)) == pytest.approx(5e-5)
