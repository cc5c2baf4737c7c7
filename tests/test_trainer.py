"""Trainer integration: pretrain phase, metrics protocol, checkpoint skip."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from fast_srgan_tpu.config import default_config
from fast_srgan_tpu.data.pipeline import CropSampler, PrefetchLoader, list_numpy_files
from fast_srgan_tpu.data.preprocess import write_images_to_numpy
from fast_srgan_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    img_dir = tmp_path_factory.mktemp("imgs")
    out = str(tmp_path_factory.mktemp("cache") / "npy")
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")
    write_images_to_numpy(str(img_dir), out, verbose=False)
    return out


def make_config(tmp_path, npy_dir, name="t"):
    return default_config(
        data={"numpy_dir": npy_dir, "lr_image_size": 8, "scale_factor": 4},
        generator={"n_filters": 8, "n_layers": 1},
        discriminator={"n_filters": 8},
        training={
            "bf16": False,
            "vgg_weights": "pixel",
            "pretrain_iterations": 2,
            "iterations": 2,
            "batch_size": 2,
            "log_iter": 1,
            "checkpoint_iter": 2,
            "checkpoint_dir": str(tmp_path / "ckpt"),
        },
        experiment={"name": name, "seed": 0},
    )


class TestPretrainPhase:
    def test_pretrain_then_skip_on_rerun(self, npy_dir, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        config = make_config(tmp_path, npy_dir)
        sampler = CropSampler(
            list_numpy_files(npy_dir), 8, 4, seed=0, backend="numpy"
        )
        loader = PrefetchLoader(sampler, 2, 2, workers=1)

        trainer = Trainer(config)
        trainer.pretrain(loader, sampler)
        step_after = int(trainer.g_state.step)
        assert step_after == 2
        trainer.close()

        # metrics.jsonl carries the reference tag schema
        log = (tmp_path / "runs" / "t" / "metrics.jsonl").read_text()
        assert "Pretrain/PSNR" in log and "Pretrain/Generator/Loss" in log

        # Second trainer: pretrain checkpoint found -> phase skipped, params
        # restored (reference trainer.py:90-94 semantics, filename bug fixed).
        trainer2 = Trainer(config)
        loader2 = PrefetchLoader(sampler, 2, 2, workers=1)
        trainer2.pretrain(loader2, sampler)
        a = np.asarray(trainer.g_state.params["params"]["neck_conv"]["kernel"])
        b = np.asarray(trainer2.g_state.params["params"]["neck_conv"]["kernel"])
        np.testing.assert_array_equal(a, b)
        trainer2.close()


class TestGanPhase:
    def test_train_then_resume_from_latest(self, npy_dir, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        config = make_config(tmp_path, npy_dir, name="g")
        sampler = CropSampler(
            list_numpy_files(npy_dir), 8, 4, seed=0, backend="numpy"
        )

        trainer = Trainer(config)
        trainer.pretrain(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        trainer.train(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        assert int(trainer.g_state.step) == 4  # 2 pretrain + 2 GAN
        trainer.close()

        log = (tmp_path / "runs" / "g" / "metrics.jsonl").read_text()
        for tag in (
            "Loss/Discriminator/Real", "Loss/Discriminator/Fake",
            "Loss/Generator/Adversarial", "Loss/Generator/Content",
            "GAN/PSNR", "GAN/SSIM",
        ):
            assert tag in log, tag

        # Restart: pretrain skipped; the GAN budget (iterations=2) is already
        # met by the step-2 checkpoint, so the phase completes immediately
        # (training.iterations is a TOTAL budget, not per-restart).
        trainer2 = Trainer(config)
        trainer2.pretrain(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        trainer2.train(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        assert int(trainer2.g_state.step) == 2  # restored, no extra steps
        trainer2.close()

    def test_partial_budget_resume(self, npy_dir, tmp_path, monkeypatch):
        # Crash-sim: first run covers 2 of 4 iterations; the restart runs
        # exactly the remaining 2 (not another full 4).
        monkeypatch.chdir(tmp_path)
        config = make_config(tmp_path, npy_dir, name="p")
        config.training.iterations = 4
        sampler = CropSampler(
            list_numpy_files(npy_dir), 8, 4, seed=0, backend="numpy"
        )
        t1 = Trainer(config)
        t1.pretrain(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        # Simulate a crash after 2 of the 4 budgeted iterations by handing
        # train() a loader that ends early (the end-of-phase snapshot plays
        # the role of the last periodic checkpoint before the crash).
        t1.train(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        assert t1.ckpt.latest_step() == 2
        t1.close()

        t2 = Trainer(config)
        t2.pretrain(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        full = PrefetchLoader(sampler, 2, 4, workers=1)
        t2.train(full, sampler)
        assert int(t2.g_state.step) == 4
        assert t2.ckpt.latest_step() == 4  # end-of-phase snapshot
        t2.close()


class TestPtExport:
    def test_four_reference_files(self, npy_dir, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        config = make_config(tmp_path, npy_dir, name="e")
        config.training.export_pt = True
        sampler = CropSampler(
            list_numpy_files(npy_dir), 8, 4, seed=0, backend="numpy"
        )
        trainer = Trainer(config)
        trainer.pretrain(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        trainer.train(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        trainer.close()
        run_dir = tmp_path / "runs" / "e"
        for name in (
            "generator_epoch_2.pt", "discriminator_epoch_2.pt",
            "generator_optim_epoch_2.pt", "discriminator_optim_epoch_2.pt",
        ):
            assert (run_dir / name).exists(), name
        # exported optimizer state loads into a real torch AdamW
        import torch
        from fast_srgan_tpu.checkpoints.torch_compat import (
            generator_torch_param_order,
        )
        gsd = torch.load(run_dir / "generator_epoch_2.pt", weights_only=True)
        osd = torch.load(
            run_dir / "generator_optim_epoch_2.pt", weights_only=True
        )
        torch_params = [
            torch.nn.Parameter(gsd[k])
            for k in generator_torch_param_order(config.generator.n_layers)
        ]
        opt = torch.optim.AdamW(torch_params, lr=1e-4)
        opt.load_state_dict(osd)
        # 2 pretrain + 2 GAN optimizer steps carried in the Adam count
        assert float(opt.state_dict()["state"][0]["step"]) == 4.0


class TestWarmStart:
    def test_init_from_reference_pt(self, npy_dir, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        if not os.path.exists("/root/reference/models/model.pt"):
            pytest.skip("reference checkpoint not mounted")
        config = make_config(tmp_path, npy_dir, name="w")
        config.generator.n_filters = 64
        config.generator.n_layers = 8
        config.training.init_generator_pt = "/root/reference/models/model.pt"
        trainer = Trainer(config)
        from fast_srgan_tpu.checkpoints.torch_compat import (
            load_reference_generator_params,
        )
        want = load_reference_generator_params(
            "/root/reference/models/model.pt"
        )
        got = trainer.g_state.params["params"]["neck_conv"]["kernel"]
        np.testing.assert_array_equal(
            np.asarray(got), want["params"]["neck_conv"]["kernel"]
        )
        trainer.close()


class TestPretrainInterruptResume:
    def test_interrupt_snapshots_and_resumes_mid_phase(
        self, npy_dir, tmp_path, monkeypatch
    ):
        monkeypatch.chdir(tmp_path)
        config = make_config(tmp_path, npy_dir, name="pi")
        config.training.pretrain_iterations = 4
        sampler = CropSampler(
            list_numpy_files(npy_dir), 8, 4, seed=0, backend="numpy"
        )

        class InterruptingLoader(PrefetchLoader):
            """Raises KeyboardInterrupt after yielding `stop_after` batches
            (simulates Ctrl-C mid-phase)."""

            stop_after = 3

            def iter_from(self, start):
                it = super().iter_from(start)
                for i, batch in enumerate(it, start=start + 1):
                    yield batch
                    if i >= self.stop_after:
                        raise KeyboardInterrupt

        loader = InterruptingLoader(sampler, 2, 4, workers=1)
        trainer = Trainer(config)
        with pytest.raises(KeyboardInterrupt):
            trainer.pretrain(loader, sampler)
        # interrupt snapshot landed at the last completed step
        assert trainer.pretrain_progress.latest_step() == 3
        # completion marker must NOT exist: the phase is unfinished
        from fast_srgan_tpu.checkpoints.orbax_io import PRETRAIN_STEP

        assert not trainer.pretrain_ckpt.has_step(PRETRAIN_STEP)
        trainer.close()

        # fresh process: resumes at step 3 and runs only the remainder
        trainer2 = Trainer(config)
        loader2 = PrefetchLoader(sampler, 2, 4, workers=1)
        trainer2.pretrain(loader2, sampler)
        assert int(trainer2.g_state.step) == 4
        assert trainer2.pretrain_ckpt.has_step(PRETRAIN_STEP)
        trainer2.close()

    def test_interrupt_overwrites_stale_prior_run_checkpoint(
        self, npy_dir, tmp_path, monkeypatch
    ):
        """resume=false over an existing run dir, interrupted at a step a
        PREVIOUS run checkpointed: the guard must save the live state over
        the stale snapshot (keyed on steps saved by this process, not
        has_step) — otherwise the next resume restores prior-run weights."""
        monkeypatch.chdir(tmp_path)
        config = make_config(tmp_path, npy_dir, name="stale")
        config.training.pretrain_iterations = 4
        sampler = CropSampler(
            list_numpy_files(npy_dir), 8, 4, seed=0, backend="numpy"
        )

        class InterruptingLoader(PrefetchLoader):
            stop_after = 3

            def iter_from(self, start):
                for i, batch in enumerate(
                    super().iter_from(start), start=start + 1
                ):
                    yield batch
                    if i >= self.stop_after:
                        raise KeyboardInterrupt

        # run 1: leaves a checkpoint at step 3
        trainer = Trainer(config)
        with pytest.raises(KeyboardInterrupt):
            trainer.pretrain(InterruptingLoader(sampler, 2, 4, workers=1), sampler)
        assert trainer.pretrain_progress.latest_step() == 3
        trainer.close()

        # run 2: fresh start (resume=false), DIFFERENT seed -> different
        # params; interrupted at the same step 3 where the stale run-1
        # checkpoint sits.
        config.training.resume = False
        config.experiment.seed = 1
        trainer2 = Trainer(config)
        with pytest.raises(KeyboardInterrupt):
            trainer2.pretrain(
                InterruptingLoader(sampler, 2, 4, workers=1), sampler
            )
        trainer2.pretrain_progress.wait()
        restored = trainer2.pretrain_progress.restore(3)
        live = np.asarray(
            trainer2.g_state.params["params"]["neck_conv"]["kernel"]
        )
        saved = np.asarray(restored["g_params"]["params"]["neck_conv"]["kernel"])
        np.testing.assert_array_equal(saved, live)
        trainer2.close()


class TestEmaTrainer:
    def test_ema_trains_checkpoints_and_resumes(
        self, npy_dir, tmp_path, monkeypatch
    ):
        monkeypatch.chdir(tmp_path)
        config = make_config(tmp_path, npy_dir, name="ema")
        config.training.ema_decay = 0.9
        config.training.iterations = 4
        sampler = CropSampler(
            list_numpy_files(npy_dir), 8, 4, seed=0, backend="numpy"
        )
        trainer = Trainer(config)
        trainer.pretrain(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        trainer.train(PrefetchLoader(sampler, 2, 4, workers=1), sampler)
        ema_leaves = [
            np.asarray(x)
            for x in jax.tree.leaves(trainer.g_state.ema_params)
        ]
        raw_leaves = [
            np.asarray(x) for x in jax.tree.leaves(trainer.g_state.params)
        ]
        assert any(
            np.abs(a - b).max() > 0 for a, b in zip(ema_leaves, raw_leaves)
        ), "EMA should lag the raw params after updates"
        trainer.close()

        # a fresh trainer restores BOTH trees from the latest checkpoint
        trainer2 = Trainer(config)
        trainer2.train(PrefetchLoader(sampler, 2, 4, workers=1), sampler)
        for a, x in zip(
            ema_leaves, jax.tree.leaves(trainer2.g_state.ema_params)
        ):
            np.testing.assert_array_equal(a, np.asarray(x))
        trainer2.close()


class TestLrLogging:
    def test_lr_tags_logged_only_with_schedule(
        self, npy_dir, tmp_path, monkeypatch
    ):
        import json

        monkeypatch.chdir(tmp_path)
        config = make_config(tmp_path, npy_dir, name="lrlog")
        config.training.lr_schedule = "step"
        config.training.lr_decay_steps = [3]
        config.training.lr_decay_factor = 0.5
        config.training.iterations = 4
        sampler = CropSampler(
            list_numpy_files(npy_dir), 8, 4, seed=0, backend="numpy"
        )
        trainer = Trainer(config)
        trainer.pretrain(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        trainer.train(PrefetchLoader(sampler, 2, 4, workers=1), sampler)
        trainer.close()

        rows = [
            json.loads(l)
            for l in (tmp_path / "runs" / "lrlog" / "metrics.jsonl")
            .read_text().splitlines() if l
        ]
        g_lr = {r["step"]: r["value"] for r in rows if r["tag"] == "LR/Generator"}
        assert g_lr, "LR/Generator not logged under lr_schedule"
        # G count spans pretrain (2 steps) + GAN: the [3]-milestone halves
        # the G lr from GAN step 2 onward (count 2+1=3 at GAN step 1's
        # update... assert monotone non-increasing and that a decay happened)
        vals = [g_lr[k] for k in sorted(g_lr)]
        assert all(b <= a for a, b in zip(vals, vals[1:]))
        # milestones count GAN-phase steps for BOTH nets (the G schedule
        # shifts past its pretrain updates): the [3]-milestone halves the
        # logged lr from GAN step 3 on
        base = config.training.generator_lr
        assert vals[0] == pytest.approx(base, rel=1e-5)
        assert vals[-1] == pytest.approx(base * 0.5, rel=1e-5)
        # ...while the pretrain logs (counts 0..1) still show the base lr
        pre = [r["value"] for r in rows if r["tag"] == "Pretrain/LR"]
        assert pre and pre[0] == pytest.approx(base, rel=1e-5)
        assert any(r["tag"] == "LR/Discriminator" for r in rows)

        # without a schedule the tag schema stays reference-identical
        # (own checkpoint dir: a scheduled run's opt-state layout differs,
        # and toggling the schedule across a resume is not supported)
        config2 = make_config(tmp_path, npy_dir, name="lrlog2")
        config2.training.checkpoint_dir = str(tmp_path / "ckpt2")
        trainer2 = Trainer(config2)
        trainer2.pretrain(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        trainer2.train(PrefetchLoader(sampler, 2, 2, workers=1), sampler)
        trainer2.close()
        log2 = (tmp_path / "runs" / "lrlog2" / "metrics.jsonl").read_text()
        assert "LR/" not in log2
