"""Jitted, donated, mesh-sharded train/eval steps.

Each reference hot loop becomes exactly one compiled XLA program:

  * ``pretrain_step`` — the generator-only L1 phase
    (reference trainer.py:104-111): SmoothL1(G(lr), hr) -> AdamW update.
  * ``gan_step`` — one full GAN iteration (reference trainer.py:165-196):
      D update: y_real=D(hr), sr=stopgrad(G(lr)), y_fake=D(sr);
                labels: real ~ U[0.8,1.1], fake ~ U[0,0.3];
                d_loss = 0.5*BCE(real) + 0.5*BCE(fake)
      G update (against the *updated* D, matching the reference's
                sequential optimizer steps):
                adv = 0.1 * BCE(D(G(lr)), labels ~ U[0.7,1.0])
                content = SmoothL1(VGG(sr), VGG(hr))
                g_loss = 0.5*adv + 0.5*content   (no pixel loss in GAN phase)
    By default the generator runs ONCE per iteration — (sr, vjp) =
    jax.vjp(G) serves both the D update (stop_gradient) and the G update
    (cotangent pullback); chain-rule-identical to the reference's two
    forwards (see the decision comment at _gan_shared below).
  * ``eval_step`` — per-batch PSNR/SSIM statistics on [0,1]-mapped images
    (reference trainer.py:53-69 protocol).

TPU-first details:
  * Input is the raw uint8 HR crop batch; float conversion, bicubic-antialias
    LR synthesis (MXU matmuls) and [-1,1] normalization are fused into the
    step (see fast_srgan_tpu/data/__init__.py).
  * Label noise uses threaded `jax.random` keys — one key in, split inside
    (the functional equivalent of the reference's torch.rand_like calls).
  * States are donated: parameters and optimizer state update in place in HBM.
  * Data parallelism by sharding annotation: batch sharded over the mesh's
    'data' axis, states replicated; XLA inserts the gradient all-reduce
    (psum over ICI). Loss means are global means because every loss term is
    a mean over batch elements of identically-shaped terms.
  * bf16 policy: model compute in bf16 (module dtype), params/optimizer fp32,
    losses fp32.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fast_srgan_tpu.metrics.psnr_ssim import ssim_per_image
from fast_srgan_tpu.models import Discriminator, Generator, VGG19Features
from fast_srgan_tpu.ops.augment import augment_dihedral
from fast_srgan_tpu.ops.resize import resize_bicubic_nhwc
from fast_srgan_tpu.train.losses import bce_with_logits_loss, smooth_l1_loss


class TrainState(train_state.TrainState):
    """flax TrainState (params + AdamW state + step counter).

    ``ema_params`` (generator state only, ``training.ema_decay`` > 0) holds
    the exponential moving average of ``params``, updated inside the jitted
    step right after the optimizer update; ``None`` when EMA is off, so the
    disabled path carries zero extra state or compute.
    """

    ema_params: Any = None


def make_optimizer(
    learning_rate, grad_clip: float = 0.0
) -> optax.GradientTransformation:
    """AdamW with torch defaults (reference trainer.py:33-38): betas
    (0.9, 0.999), eps 1e-8, weight_decay 0.01.

    ``learning_rate`` may be a float (the reference: constant) or an optax
    schedule callable (training.lr_schedule — see make_lr_schedule).
    ``grad_clip`` > 0 clips the global gradient norm before AdamW
    (training.grad_clip; the reference does not clip)."""
    adamw = optax.adamw(
        learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
    )
    if grad_clip and grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(float(grad_clip)), adamw)
    return adamw


def make_lr_schedule(
    config, base_lr: float, gan_steps: int, pretrain_offset: int = 0
):
    """Resolve training.lr_schedule to a float or an optax schedule.

    The reference trains at constant LR for the whole run (trainer.py:33-38
    + configs/config.yaml:24-25); ``lr_schedule: null`` preserves that.
    Opt-ins (standard SRGAN-family recipes), both positioned in
    **GAN-phase optimizer steps** for BOTH optimizers — the generator's
    schedule is shifted past its pretrain updates (``pretrain_offset``,
    constant base LR there), so G and D decay at the same training points:

      * ``"step"``  — multiply LR by training.lr_decay_factor at each
        GAN-step milestone in training.lr_decay_steps (the ESRGAN halving
        recipe).
      * ``"cosine"`` — cosine decay from base_lr to
        base_lr * training.lr_min_ratio over the GAN phase.

    The schedule position is the optax update count inside the optimizer
    state, which is checkpointed — resume continues the decay exactly.
    """
    sched = config.training.get("lr_schedule")
    if not sched:
        return base_lr
    if sched == "cosine":
        inner = optax.cosine_decay_schedule(
            base_lr,
            max(1, int(gan_steps)),
            alpha=float(config.training.get("lr_min_ratio", 0.1)),
        )
    elif sched == "step":
        steps = config.training.get("lr_decay_steps") or []
        factor = float(config.training.get("lr_decay_factor", 0.5))
        inner = optax.piecewise_constant_schedule(
            base_lr, {int(s): factor for s in steps}
        )
    else:
        raise ValueError(
            f"unknown training.lr_schedule {sched!r} (null, 'step', 'cosine')"
        )
    if pretrain_offset:
        return optax.join_schedules(
            [optax.constant_schedule(base_lr), inner],
            [int(pretrain_offset)],
        )
    return inner


class GanBundle(NamedTuple):
    """Everything the trainer needs: models, states, jitted steps."""

    generator: Generator
    discriminator: Discriminator
    vgg: VGG19Features
    pretrain_step: Any
    gan_step: Any
    eval_step: Any
    render_step: Any
    mesh: Optional[Mesh]


def prepare_batch(
    hr_u8: jnp.ndarray, lr_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uint8 HR crops -> ([-1,1] LR, [-1,1] HR), on device.

    Mirrors the reference pipeline order (dataloader.py:30-38): crop -> float
    -> bicubic-antialias downsample of the 0..255-scaled tensor -> /127.5-1.
    """
    hr_f = hr_u8.astype(jnp.float32)
    lr_f = resize_bicubic_nhwc(hr_f, lr_size, lr_size, antialias=True)
    return lr_f / 127.5 - 1.0, hr_f / 127.5 - 1.0


def build_bundle(
    config,
    mesh: Optional[Mesh] = None,
    rng: Optional[jax.Array] = None,
) -> Tuple[GanBundle, TrainState, TrainState, Dict]:
    """Construct models, initial states, and the jitted step functions."""
    dtype = jnp.bfloat16 if config.training.bf16 else jnp.float32
    generator = Generator(
        n_filters=config.generator.n_filters,
        n_layers=config.generator.n_layers,
        scale_factor=config.data.scale_factor,
        dtype=dtype,
        use_pallas=config.kernels.use_pallas,
        fused_upsample=config.kernels.get("fused_upsample", False),
        remat=config.training.get("remat", False),
    )
    discriminator = Discriminator(
        n_filters=config.discriminator.n_filters, dtype=dtype
    )
    vgg = VGG19Features(dtype=dtype)

    # VGG weights: converted torchvision state_dict when provided, else a
    # fixed-seed init (see models/vgg.py docstring). A random-init VGG gives
    # a near-zero content loss, leaving only the adversarial term — measured
    # to collapse generator fidelity (32.6 -> 10.1 dB in 2000 GAN steps) —
    # so without real VGG weights the content term falls back to pixel-space
    # SmoothL1 (the pretrain objective), keeping the reference's 0.5/0.5
    # loss structure anchored. Checked BEFORE the state inits: the config
    # error must surface instantly, not after the G/D init compiles.
    vgg_path = config.training.vgg_weights
    if not vgg_path and config.training.iterations > 0:
        # The reference GAN phase is defined by its frozen ImageNet-VGG19
        # perceptual loss (reference trainer.py:190-192; weights that
        # torchvision auto-downloads at reference model.py:8). Silently
        # training a different recipe is worse than stopping: fail up front,
        # before hours of pretraining precede a non-reference GAN phase.
        raise ValueError(
            "training.iterations > 0 (GAN phase) but training.vgg_weights is "
            "not set. The reference recipe needs ImageNet VGG19 weights: "
            "supply torchvision's checkpoint file "
            "(vgg19-dcbb9e9d.pth, from "
            "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth) via "
            "training.vgg_weights=/path/to/vgg19-dcbb9e9d.pth. Explicit "
            "opt-outs: training.vgg_weights=pixel (content loss falls back "
            "to pixel-space SmoothL1 — trains, but is NOT the reference "
            "recipe) or =init (fixed-seed random VGG: profiling only, "
            "collapses fidelity). Pretrain-only runs (training.iterations=0) "
            "need no VGG."
        )
    has_vgg = bool(vgg_path) and vgg_path != "pixel"

    rng = rng if rng is not None else jax.random.key(config.experiment.seed)
    k_g, k_d, k_v = jax.random.split(rng, 3)
    lr_size = config.data.lr_image_size
    hr_size = lr_size * config.data.scale_factor
    g_params = generator.init(k_g, jnp.zeros((1, lr_size, lr_size, 3)))
    d_params = discriminator.init(k_d, jnp.zeros((1, hr_size, hr_size, 3)))

    if vgg_path == "init":
        # Sentinel: run the VGG-features content loss with the fixed-seed
        # init weights. The full reference loss *formulation* (and its
        # compute/HBM cost — profiling, throughput work) without ImageNet
        # weights; NOT a training recommendation (random features collapse
        # fidelity, measured above).
        vgg_params = vgg.init(k_v, jnp.zeros((1, hr_size, hr_size, 3)))
    elif has_vgg:
        from fast_srgan_tpu.checkpoints.torch_compat import (
            load_torch_state_dict,
            vgg19_params_from_torch_state_dict,
        )
        vgg_params = vgg19_params_from_torch_state_dict(
            load_torch_state_dict(vgg_path)
        )
    else:
        if vgg_path == "pixel":
            print(
                "training.vgg_weights=pixel: GAN content loss is pixel-space "
                "SmoothL1 (explicit opt-out; the reference recipe uses "
                "ImageNet-VGG19 features)"
            )
        # The content loss never touches VGG in this mode — don't build or
        # replicate the ~80 MB fp32 tree; the jitted step drops the unused
        # (empty) argument.
        vgg_params = {}

    g_lr = config.training.generator_lr
    d_lr = config.training.discriminator_lr
    if mesh is not None and config.parallel.scale_lr:
        g_lr *= mesh.size
        d_lr *= mesh.size
    g_lr = make_lr_schedule(
        config, g_lr, config.training.iterations,
        pretrain_offset=config.training.pretrain_iterations,
    )
    d_lr = make_lr_schedule(config, d_lr, config.training.iterations)
    ema_decay = float(config.training.get("ema_decay", 0.0) or 0.0)
    grad_clip = float(config.training.get("grad_clip", 0.0) or 0.0)
    g_state = TrainState.create(
        apply_fn=generator.apply, params=g_params,
        tx=make_optimizer(g_lr, grad_clip),
        # a COPY of the params: both fields are donated together, and
        # aliased buffers would be donated twice (runtime error)
        ema_params=(
            jax.tree.map(jnp.array, g_params) if ema_decay else None
        ),
    )
    d_state = TrainState.create(
        apply_fn=discriminator.apply, params=d_params,
        tx=make_optimizer(d_lr, grad_clip),
    )

    def ema_update(state: TrainState) -> TrainState:
        """Post-optimizer EMA lerp (plain, ESRGAN-style: no debiasing —
        the average starts AT the initial params, not at zero)."""
        if not ema_decay:
            return state
        new_ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema_params, state.params,
        )
        return state.replace(ema_params=new_ema)

    # ---------------- step definitions ----------------

    # training.augment (default false = the reference recipe, crops only):
    # per-sample dihedral augmentation of the uint8 HR crops inside the
    # jitted step, before LR synthesis (ops/augment.py). Pretrain has no
    # per-step key in its signature, so it derives one deterministically
    # from the step counter — which is restored on resume, so an
    # interrupted augmented run replays the same transforms.
    augment = bool(config.training.get("augment", False))
    aug_base = (
        jax.random.fold_in(jax.random.key(config.experiment.seed), 0xD4)
        if augment else None
    )

    def _maybe_augment(hr_u8: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        return augment_dihedral(hr_u8, key) if augment else hr_u8

    # Gradient accumulation (training.grad_accum=k, default 1): a pure
    # memory knob — the step still takes the full training.batch_size
    # batch but scans over k micro-batches of B/k, averaging gradients
    # before the (single) optimizer update, so activation memory is that
    # of batch B/k while the data/optimizer semantics are unchanged. The
    # losses are means over equally-sized micro-batches, so the averaged
    # gradient equals the one big-batch gradient exactly (fp32 reduction
    # order aside); verified in tests/test_train_steps.py. Composes with
    # the mesh: the scan happens per device over its own batch shard.
    accum = int(config.training.get("grad_accum", 1) or 1)

    def _microbatches(hr_u8: jnp.ndarray) -> jnp.ndarray:
        if hr_u8.shape[0] % accum:
            raise ValueError(
                f"training.batch_size {hr_u8.shape[0]} not divisible by "
                f"training.grad_accum {accum}"
            )
        return hr_u8.reshape(accum, -1, *hr_u8.shape[1:])

    def _accum_grads(loss_and_grad_fn, params, xs):
        """Unrolled micro-batch loop; mean grads + metrics.

        Statically unrolled on purpose: a `lax.scan` formulation measured
        **33x slower** on v5e (707 vs 20.4 ms for the batch-96 GAN step at
        accum 4) — convolution layout assignment degrades across the
        while-loop boundary, a known TPU lowering hazard. Unrolling keeps
        compile time O(accum), which is fine for the practical k <= 8.
        """
        grads_sum = None
        outs = []
        for i in range(accum):
            x_i = jax.tree.map(lambda a: a[i], xs)
            out, grads = loss_and_grad_fn(params, x_i)
            outs.append(out)
            grads_sum = grads if grads_sum is None else jax.tree.map(
                jnp.add, grads_sum, grads
            )
        mean_grads = jax.tree.map(lambda g: g / accum, grads_sum)
        mean_outs = jax.tree.map(
            lambda *vals: jnp.mean(jnp.stack(vals)), *outs
        )
        return mean_grads, mean_outs

    def _pretrain(g_state: TrainState, hr_u8: jnp.ndarray):
        if augment:
            hr_u8 = _maybe_augment(
                hr_u8, jax.random.fold_in(aug_base, g_state.step)
            )

        def loss_and_grad(params, hr_i):
            lr_img, hr_img = prepare_batch(hr_i, lr_size)

            def loss_fn(p):
                sr = generator.apply(p, lr_img)
                return smooth_l1_loss(sr, hr_img)

            return jax.value_and_grad(loss_fn)(params)

        if accum == 1:
            loss, grads = loss_and_grad(g_state.params, hr_u8)
        else:
            grads, loss = _accum_grads(
                loss_and_grad, g_state.params, _microbatches(hr_u8)
            )
        return ema_update(g_state.apply_gradients(grads=grads)), loss

    # Shared-forward GAN step (default): the reference evaluates the
    # generator twice per iteration — once detached for the D update, once
    # fresh for the G update (reference trainer.py:174,185) — because its
    # two optimizer steps are separate autograd graphs. Inside ONE jitted
    # program both uses see the SAME parameters (G updates only at the end),
    # so a single forward suffices: take `(sr, g_vjp) = jax.vjp(G)`, feed
    # `stop_gradient(sr)` to the D update, then pull the G-loss cotangent
    # back through `g_vjp`. Chain rule makes this *mathematically identical*
    # to the recompute form (asserted in tests/test_train_steps.py); it
    # removes one full generator forward (~0.3 TFLOP @ batch 96) from the
    # step. `training.gan_shared_forward=false` restores the recompute form
    # (it is also used automatically when grad_accum > 1, where holding
    # every micro-batch's vjp residuals would defeat the memory knob).
    shared_fwd = (
        bool(config.training.get("gan_shared_forward", True)) and accum == 1
    )
    # training.remat_vgg: wrap the frozen VGG feature extractor in
    # jax.checkpoint so its conv activations are recomputed during the
    # backward pass instead of living in HBM between forward and backward.
    remat_vgg = bool(config.training.get("remat_vgg", False))
    # training.vgg_concat: run VGG(sr) and VGG(hr) as ONE concatenated
    # forward (batch 2B). VGG is batch-independent (convs/relus/pools, no
    # normalization), so splitting the output equals the two separate
    # calls exactly (asserted in tests/test_train_steps.py); the fused
    # form doubles each conv's batch — larger MXU tiles, half the kernel
    # dispatches — at the cost of holding both activation sets at once.
    # The hr half is wrapped in stop_gradient, so the backward pass only
    # pulls cotangents through the sr half either way. A/B arm for the
    # batch-96 GAN+VGG roofline gap (docs/DESIGN.md).
    vgg_concat = bool(config.training.get("vgg_concat", False))

    def content_term(vgg_params, sr, hr_img):
        """0.5-weighted content loss term (reference trainer.py:190-192)."""
        if has_vgg:
            vapply = jax.checkpoint(vgg.apply) if remat_vgg else vgg.apply
            if vgg_concat:
                both = vapply(
                    vgg_params,
                    jnp.concatenate(
                        [sr, jax.lax.stop_gradient(hr_img)], axis=0
                    ),
                )
                f_sr, f_hr = jnp.split(both, 2, axis=0)
                return smooth_l1_loss(f_sr, f_hr)
            return smooth_l1_loss(
                vapply(vgg_params, sr), vapply(vgg_params, hr_img)
            )
        return smooth_l1_loss(sr, hr_img)  # pixel anchor (build_bundle note)

    def _gan_shared(
        g_state: TrainState,
        d_state: TrainState,
        vgg_params,
        hr_u8: jnp.ndarray,
        rng: jax.Array,
    ):
        if augment:
            rng, k_aug = jax.random.split(rng, 2)
            hr_u8 = _maybe_augment(hr_u8, k_aug)
        lr_img, hr_img = prepare_batch(hr_u8, lr_size)
        k_d, k_g = jax.random.split(rng, 2)
        k_real, k_fake = jax.random.split(k_d, 2)

        sr, g_vjp = jax.vjp(
            lambda p: generator.apply(p, lr_img), g_state.params
        )
        sr_detached = jax.lax.stop_gradient(sr)

        def d_loss_fn(p):
            y_real = discriminator.apply(p, hr_img)
            y_fake = discriminator.apply(p, sr_detached)
            real_labels = 0.3 * jax.random.uniform(k_real, y_real.shape) + 0.8
            fake_labels = 0.3 * jax.random.uniform(k_fake, y_fake.shape)
            loss_real = bce_with_logits_loss(y_real, real_labels)
            loss_fake = bce_with_logits_loss(y_fake, fake_labels)
            return 0.5 * loss_real + 0.5 * loss_fake, (loss_real, loss_fake)

        (d_loss, (loss_real, loss_fake)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_state.params)
        d_state = d_state.apply_gradients(grads=d_grads)

        def g_loss_from_sr(sr_):
            # against the UPDATED d_state (reference :184-196)
            y_fake = discriminator.apply(d_state.params, sr_)
            labels = 0.3 * jax.random.uniform(k_g, y_fake.shape) + 0.7
            adv = 0.1 * bce_with_logits_loss(y_fake, labels)
            content = content_term(vgg_params, sr_, hr_img)
            return 0.5 * adv + 0.5 * content, (adv, content)

        (g_loss, (adv_loss, content_loss)), d_sr = jax.value_and_grad(
            g_loss_from_sr, has_aux=True
        )(sr)
        (g_grads,) = g_vjp(d_sr)
        g_state = ema_update(g_state.apply_gradients(grads=g_grads))

        metrics = {
            "d_loss": d_loss,
            "loss_real": loss_real,
            "loss_fake": loss_fake,
            "g_loss": g_loss,
            "adv_loss": adv_loss,
            "content_loss": content_loss,
        }
        return g_state, d_state, metrics

    def _gan_recompute(
        g_state: TrainState,
        d_state: TrainState,
        vgg_params,
        hr_u8: jnp.ndarray,
        rng: jax.Array,
    ):
        def d_loss_and_grad(d_params, xs):
            """(d_loss, aux), grads for ONE micro-batch (reference
            trainer.py:171-181)."""
            hr_i, key = xs
            lr_img, hr_img = prepare_batch(hr_i, lr_size)
            k_real, k_fake = jax.random.split(key, 2)
            sr_detached = jax.lax.stop_gradient(
                generator.apply(g_state.params, lr_img)
            )

            def d_loss_fn(p):
                y_real = discriminator.apply(p, hr_img)
                y_fake = discriminator.apply(p, sr_detached)
                real_labels = (
                    0.3 * jax.random.uniform(k_real, y_real.shape) + 0.8
                )
                fake_labels = 0.3 * jax.random.uniform(k_fake, y_fake.shape)
                loss_real = bce_with_logits_loss(y_real, real_labels)
                loss_fake = bce_with_logits_loss(y_fake, fake_labels)
                return 0.5 * loss_real + 0.5 * loss_fake, (
                    loss_real, loss_fake
                )

            return jax.value_and_grad(d_loss_fn, has_aux=True)(d_params)

        def make_g_loss_and_grad(d_params):
            # closes over the UPDATED d_params (reference :184-196: the G
            # step runs against the already-stepped discriminator)
            def g_loss_and_grad(g_params, xs):
                hr_i, key = xs
                lr_img, hr_img = prepare_batch(hr_i, lr_size)

                def g_loss_fn(p):
                    sr = generator.apply(p, lr_img)
                    y_fake = discriminator.apply(d_params, sr)
                    labels = 0.3 * jax.random.uniform(key, y_fake.shape) + 0.7
                    adv = 0.1 * bce_with_logits_loss(y_fake, labels)
                    content = content_term(vgg_params, sr, hr_img)
                    return 0.5 * adv + 0.5 * content, (adv, content)

                return jax.value_and_grad(g_loss_fn, has_aux=True)(g_params)

            return g_loss_and_grad

        if augment:
            # Same split order as the shared form, so both formulations see
            # identical augmented batches under the same key (equivalence
            # test in tests/test_train_steps.py).
            rng, k_aug = jax.random.split(rng, 2)
            hr_u8 = _maybe_augment(hr_u8, k_aug)
        k_d, k_g = jax.random.split(rng, 2)
        if accum == 1:
            (d_loss, (loss_real, loss_fake)), d_grads = d_loss_and_grad(
                d_state.params, (hr_u8, k_d)
            )
            d_state = d_state.apply_gradients(grads=d_grads)
            (g_loss, (adv_loss, content_loss)), g_grads = (
                make_g_loss_and_grad(d_state.params)(
                    g_state.params, (hr_u8, k_g)
                )
            )
            g_state = ema_update(g_state.apply_gradients(grads=g_grads))
        else:
            hrs = _microbatches(hr_u8)
            d_grads, (d_loss, (loss_real, loss_fake)) = _accum_grads(
                d_loss_and_grad, d_state.params,
                (hrs, jax.random.split(k_d, accum)),
            )
            d_state = d_state.apply_gradients(grads=d_grads)
            g_grads, (g_loss, (adv_loss, content_loss)) = _accum_grads(
                make_g_loss_and_grad(d_state.params), g_state.params,
                (hrs, jax.random.split(k_g, accum)),
            )
            g_state = ema_update(g_state.apply_gradients(grads=g_grads))

        metrics = {
            "d_loss": d_loss,
            "loss_real": loss_real,
            "loss_fake": loss_fake,
            "g_loss": g_loss,
            "adv_loss": adv_loss,
            "content_loss": content_loss,
        }
        return g_state, d_state, metrics

    _gan = _gan_shared if shared_fwd else _gan_recompute

    def _eval(g_params, hr_u8: jnp.ndarray, valid: jnp.ndarray):
        """Masked [0,1]-mapped SSE/SSIM sums (reference trainer.py:64-66).

        ``valid`` is a float [B] mask (0 for the rows a partial tail batch
        was padded with — batches are padded to one fixed size so a single
        eval program serves the whole pass). Masking and reduction happen
        ON DEVICE and the outputs are replicated scalars, so the same
        program is correct on one chip, a local mesh, and multi-host
        meshes (per-image vectors would be batch-sharded across hosts —
        not addressable from any single process)."""
        lr_img, hr_img = prepare_batch(hr_u8, lr_size)
        sr01 = (generator.apply(g_params, lr_img) + 1.0) / 2.0
        hr01 = (hr_img + 1.0) / 2.0
        diff = sr01 - hr01
        sse = jnp.sum(diff * diff, axis=(1, 2, 3))
        ssim = ssim_per_image(sr01, hr01)
        v = valid.astype(jnp.float32)
        return jnp.sum(sse * v), jnp.sum(ssim * v), jnp.sum(v)

    def _render(g_params, lr01: jnp.ndarray):
        """Fixed-image panel render: [0,1] LR -> [0,1] SR (trainer.py:122)."""
        sr = generator.apply(g_params, 2.0 * lr01 - 1.0)
        return jnp.clip((sr + 1.0) / 2.0, 0.0, 1.0)

    # ---------------- jit with shardings ----------------

    # The inference-side tuned 48 MiB scoped-VMEM budget (utils/xla_opts.py)
    # is deliberately NOT applied here: a measured A/B on the training
    # chains (docs/DESIGN.md, round 3) showed it HURTS every training
    # program — GAN step at b24 regressed 7.5 -> 15.2 ms — so training
    # compiles with XLA defaults. FASTSR_TRAIN_COMPILER_OPTIONS overrides
    # for experiments (same env contract as FASTSR_COMPILER_OPTIONS:
    # unset/blank = default, `null` = explicitly none, else JSON object).
    from fast_srgan_tpu.utils.xla_opts import env_json_options

    _, copts = env_json_options("FASTSR_TRAIN_COMPILER_OPTIONS")

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        batch_s = NamedSharding(
            mesh, P(config.parallel.data_axis)
        )
        pretrain_step = jax.jit(
            _pretrain,
            in_shardings=(repl, batch_s),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
            compiler_options=copts,
        )
        gan_step = jax.jit(
            _gan,
            in_shardings=(repl, repl, repl, batch_s, repl),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
            compiler_options=copts,
        )
        eval_step = jax.jit(
            _eval, in_shardings=(repl, batch_s, batch_s), out_shardings=repl
        )
        render_step = jax.jit(_render, in_shardings=(repl, repl))
    else:
        pretrain_step = jax.jit(
            _pretrain, donate_argnums=(0,), compiler_options=copts
        )
        gan_step = jax.jit(
            _gan, donate_argnums=(0, 1), compiler_options=copts
        )
        eval_step = jax.jit(_eval)
        render_step = jax.jit(_render)

    bundle = GanBundle(
        generator=generator,
        discriminator=discriminator,
        vgg=vgg,
        pretrain_step=pretrain_step,
        gan_step=gan_step,
        eval_step=eval_step,
        render_step=render_step,
        mesh=mesh,
    )
    return bundle, g_state, d_state, vgg_params
