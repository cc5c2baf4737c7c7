"""Batched, jitted super-resolution inference engine.

Capability parity with the reference CLI (/root/reference/inference.py):
arbitrary-resolution 4x upscaling of an image directory with the pretrained
generator, identical normalization (in: x/127.5 - 1, out: (y+1)/2 * 255 ->
uint8; reference inference.py:50-56).

TPU-first redesign of the reference's per-frame, batch-1, host-synchronous
loop (its throughput limiter — SURVEY.md §3.3):

  * one jitted forward per (batch, H, W) signature, compile-cached;
  * images grouped by shape and batched;
  * optional shape bucketing (zero-pad LR to a bucket grid, crop the 4x
    output) to bound recompiles on heterogeneous directories — EXACT: the
    masked forward (Generator valid_hw) computes instance-norm statistics
    over each sample's valid region only and re-zeros padding after every
    bias/norm, so padding only ever supplies the zeros the true image
    edge's conv padding would. Each valid output pixel equals the unpadded
    program's. Mixed true shapes batch together within a bucket;
  * streaming video path: frames flow through a double-buffered pipeline —
    JAX's async dispatch overlaps H2D copy of frame t+1 with compute of
    frame t; device->host transfer of uint8 (4x less PCIe than fp32);
  * uint8 -> float normalization happens on device inside the jit.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterable, Iterator, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast_srgan_tpu.models import Generator


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_warned_device_generation = False


def _warn_unprofiled_device_generation() -> None:
    """Warn once when running on a TPU generation the batch policy wasn't
    profiled on.

    `PIXEL_BUDGET` and the "never compile batch 2..7" rule are v5e
    measurements (docs/DESIGN.md "Batch-size anatomy"); on another
    generation both can be wrong in either direction (more/less HBM,
    different conv lowerings). The engine still runs — this flags that
    `pixel_budget=` should be re-probed rather than inherited silently.
    """
    global _warned_device_generation
    if _warned_device_generation:
        return
    _warned_device_generation = True
    try:
        dev = jax.devices()[0]
    except Exception:
        return
    kind = str(getattr(dev, "device_kind", ""))
    if dev.platform == "tpu" and "v5 lite" not in kind.lower():
        import warnings

        warnings.warn(
            "SRInferenceEngine's batch policy (PIXEL_BUDGET="
            f"{SRInferenceEngine.PIXEL_BUDGET}, batch 2..7 avoidance) was "
            f"measured on TPU v5e but this device is {kind!r}; pass "
            "pixel_budget= after re-probing if throughput or HBM limits "
            "look off.",
            stacklevel=3,
        )


def sr_forward_u8(apply, params, x_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 NHWC in -> uint8 NHWC SR out: THE serving normalization.

    The single definition of the uint8 forward semantics (in: x/127.5 - 1,
    out: (y+1)*127.5 clipped, cast — reference inference.py:50-56), shared
    by the live engine (`SRInferenceEngine._forward_u8`) and the StableHLO
    deployment export (`fast_srgan_tpu.export.build_forward_u8`) so the
    two can never drift apart.
    """
    x = x_u8.astype(jnp.float32) / 127.5 - 1.0
    y = apply(params, x)
    return ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)


def arch_from_params(params: Dict[str, Any]) -> Dict[str, int]:
    """Read the generator architecture off a param pytree.

    The tree fully determines the model: the neck conv's output features are
    ``n_filters``, the ``stem_i`` count is ``n_layers``, and each
    ``upsampling_i`` stage doubles resolution (so scale = 2**count). Lets
    CLIs accept any checkpoint without matching config edits — the
    reference hardcodes its architecture in configs/config.yaml and loads
    only the one shipped model (reference inference.py:26-33).
    """
    p = params["params"] if "params" in params else params
    if "neck_conv" not in p:
        raise ValueError(
            "not a generator param tree (no 'neck_conv'); got keys "
            f"{sorted(p)[:8]}"
        )
    return {
        "n_filters": int(p["neck_conv"]["kernel"].shape[-1]),
        "n_layers": sum(1 for k in p if str(k).startswith("stem_")),
        "scale_factor": 2
        ** sum(1 for k in p if str(k).startswith("upsampling_")),
    }


class SRInferenceEngine:
    """Jitted SR engine (scale 2/4/8) over a fixed parameter set.

    Args:
      params: Flax param pytree for :class:`Generator`.
      n_filters / n_layers: generator hyperparameters.
      dtype: compute dtype (bf16 recommended on TPU; params stay fp32).
      bucket: zero-pad inputs up to multiples of `bucket` (LR pixels) and
        crop the output, bounding the number of compiled shapes. Exact (see
        module docstring). 0 = one compiled program per distinct shape.
      use_pallas: enable the Pallas fused stem kernels.
      mesh: optional 1-D `jax.sharding.Mesh` — batches are sharded across it
        (data-parallel serving: N chips upscale N slices of every batch;
        batch sizes must divide the mesh). Orthogonal to the spatial tiling
        path in parallel/spatial.py, which shards a single huge frame.
      scale_factor: total upscale (2, 4, or 8); 4 matches the reference.
      lr_tail: run the upsampling tail entirely at LR resolution via the
        exact phase-decomposition transform (ops/lr_tail.py) — measured
        1.27x end-to-end on v5e (71.9 -> 56.8 ms per 16x180x320 batch) with
        bf16-reassociation-level output differences only; the 8x
        hierarchical variant measures 1.65x (152.5 -> 92.5 ms per
        4x180x320 batch) and the 2x single-stage one 1.09x. Default
        (None): on whenever the Pallas tier is off.
      pixel_budget: max total LR pixels per compiled batch *per device*.
        Bounds activation memory: at 4x the widest intermediate holds
        ~2 KiB per LR pixel (the 64-ch 4x-res map, or the LR tail's
        1024-ch LR map), and v5e compiles/runs 3.96 Mpx (540x960 x8) but
        fails to allocate 7.4 Mpx (720x1280 x8). Batch sizes are derived
        from this via :meth:`effective_batch_size`.
      quantize: run the int8 PTQ forward (fast_srgan_tpu/quant.py):
        int8xint8->int32 convs on the MXU with per-output-channel weight
        scales and calibrated static per-tensor activation scales; the
        float glue between convs uses `dtype`. True = the measured-optimal
        ups-only policy — upsampling stages int8, trunk AND head float
        (see the inline note in `__init__`; 'tail'/'full'/'trunk'
        selectable as measured baselines). Inference-only; quality bound
        measured in tests/test_quant.py and scripts/eval_int8.py.
        Composes with `bucket` in the float-trunk modes (ups/tail: the
        masked float trunk + int8 tail with pad re-zeroing —
        quant.sr_quant_forward_masked); 'full'/'trunk' with bucket, and
        `use_pallas`, are rejected.
      act_scales: precomputed activation scales (quant.calibrate_scales).
        They are jit *inputs*, so :meth:`recalibrate` never recompiles.
      calib_batches: iterable of sample inputs ([-1,1] float NHWC/HWC or
        uint8) to calibrate on when `act_scales` is None. Default: one
        synthetic natural-statistics batch (quant.default_calibration_batch)
        — calibrating on real inputs is preferred and what infer.py --int8
        does.
    """

    # Measured on v5e (docs/DESIGN.md "Batch-size anatomy"): compiled batch
    # sizes 2..7 lower to a conv strategy that wastes MXU sublanes — 200-320
    # ns/LR-pixel at every shape tested, vs ~100 at batch 1 and 55-77 at
    # batch >= 8. So the engine only ever compiles batch 1 or batch >= 8.
    PIXEL_BUDGET = 4_200_000
    # The production int8 (ups-only, unbucketed) programs get their own
    # measured per-scale batch budgets (LR pixels per compiled program;
    # sweeps: scripts/eval_int8.py --scale, v5e 2026-08-20 at 180x320 —
    # docs/DESIGN.md "int8 decision record"):
    #   4x: batch 128 — the phase-summed head (quant._tail_4x) never
    #       materializes the 16F concat that was the HBM watermark, so
    #       batch 128 runs (bf16 OOMs past ~104) and is the fps optimum:
    #       657.6 fps vs 579.8 at the old concat-form cap of 112
    #       (scripts/phase_summed_head_experiment.py). Larger batches
    #       still run but XLA's schedule collapses (132+: ~346 ms/batch),
    #       so the budget IS the operating point, not just an OOM ceiling.
    #   2x: batch 128 is the optimum here too (1129 fps vs 1037 bf16;
    #       160+ collapses to ~730) — the same pixel count as 4x.
    #   8x: batch 16 (139.1 fps vs 112.8 bf16@24; 24 measures 136.9 and
    #       32 OOMs — the hierarchical tail's int32 buffers at 2x
    #       resolution are the watermark), i.e. the 4x budget / 8.
    INT8_UPS_PIXEL_BUDGETS = {
        2: 128 * 180 * 320,  # 7_372_800
        4: 128 * 180 * 320,  # 7_372_800
        8: 16 * 180 * 320,   # 921_600
    }
    # Back-compat alias (the 4x figure this constant always meant).
    INT8_UPS_PIXEL_BUDGET = INT8_UPS_PIXEL_BUDGETS[4]

    def __init__(
        self,
        params: Dict[str, Any],
        n_filters: int = 64,
        n_layers: int = 8,
        dtype: Any = jnp.bfloat16,
        bucket: int = 0,
        use_pallas: bool = False,
        mesh=None,
        scale_factor: int = 4,
        lr_tail: bool | None = None,
        pixel_budget: int | None = None,
        quantize: bool | str = False,
        act_scales: Dict[str, Any] | None = None,
        calib_batches: Iterable[Any] | None = None,
    ):
        _warn_unprofiled_device_generation()
        if pixel_budget is None:
            # The measured budget is 4x geometry (~2 KiB/LR px widest
            # intermediate). 8x roughly quadruples the per-LR-pixel
            # footprint (the 64-ch 8x map, or the hierarchical tail's
            # 1024-ch 2x-res map), so derate accordingly; 2x keeps the
            # conservative 4x number.
            pixel_budget = (
                self.PIXEL_BUDGET // 4 if scale_factor == 8
                else self.PIXEL_BUDGET
            )
            # Unbucketed production int8: use its own measured per-scale
            # operating point (INT8_UPS_PIXEL_BUDGETS; class-level note —
            # each scale's budget is a swept fps optimum, not a guess).
            # The masked/bucketed path keeps the conservative bf16 budget:
            # its watermark was not swept batch-by-batch.
            if (
                quantize in (True, "ups")
                and not bucket
                and scale_factor in self.INT8_UPS_PIXEL_BUDGETS
            ):
                pixel_budget = self.INT8_UPS_PIXEL_BUDGETS[scale_factor]
        self.pixel_budget = pixel_budget
        self.SCALE = scale_factor
        self.model = Generator(
            n_filters=n_filters, n_layers=n_layers, dtype=dtype,
            use_pallas=use_pallas, scale_factor=scale_factor,
        )
        if bucket and use_pallas:
            raise ValueError(
                "bucketed (masked) inference is not supported with the "
                "Pallas tier; use bucket=0 or use_pallas=False"
            )
        if lr_tail is None:
            lr_tail = not use_pallas  # all scales: 2/4 full-LR, 8 hierarchical
        self.lr_tail = lr_tail
        if lr_tail:
            from fast_srgan_tpu.ops.lr_tail import generator_apply_lr_tail

            # batch_divisor: the head policy keys on PER-DEVICE batch —
            # under a data mesh the global jit shape overstates what each
            # chip computes (generator_apply_lr_tail docstring).
            self._apply = functools.partial(
                generator_apply_lr_tail, self.model,
                batch_divisor=mesh.size if mesh is not None else 1,
            )
        else:
            self._apply = self.model.apply
        self.bucket = bucket
        self.quantize = bool(quantize)
        if quantize:
            # True selects the measured-optimal policy: quantize only the
            # upsampling stages (the LR tail minus the head conv).
            # Measured on v5e (scripts/eval_int8.py, 2026-08-19, 180x320):
            # the wide no-IN tail convs ride the 2x int8 MXU rate, so
            # tail-only beat bf16 (477.2 fps @88 vs 463.7 @96) — but the
            # int8 head's int32 conv output caps the batch at 88. Keeping
            # the head float ("ups") lifts the cap AND raises fidelity
            # (41.91 dB vs fp32 against tail-only's 40.60, production
            # percentile calibration: one fewer quantized layer); with
            # the phase-summed head the operating point is batch 128 at
            # 657.6 fps sustained (655.1 on the 800-frame protocol).
            # Quantizing the IN-glued 64-ch trunk LOSES (trunk-only 366.9,
            # full int8 405.2: the float glue keeps activations at bf16
            # width, so the trunk's convs gain nothing and pay the
            # quantize passes). "tail"/"full"/"trunk" remain selectable
            # as measured baselines (docs/DESIGN.md "int8 decision
            # record").
            mode = "ups" if quantize is True else str(quantize)
            if mode not in ("tail", "ups", "full", "trunk"):
                raise ValueError(
                    "quantize must be True/'tail'/'ups'/'full'/'trunk': "
                    f"{mode!r}"
                )
            self.quantize_mode = mode
            if bucket and mode not in ("tail", "ups"):
                raise ValueError(
                    "bucketed (masked) int8 requires a float trunk "
                    "(tail/ups modes): per-sample masked instance-norm "
                    "statistics are float-path only (quant.sr_quant_"
                    "forward_masked). Use quantize=True/'tail'/'ups', "
                    "or bucket=0."
                )
            if use_pallas:
                raise ValueError(
                    "int8 inference and the Pallas tier are mutually "
                    "exclusive; use quantize=False or use_pallas=False"
                )
            from fast_srgan_tpu import quant

            # Keep the float tree: recalibrate() re-runs the float forward.
            self._float_params = params
            # True iff the scales came from the built-in synthetic batch
            # (neither act_scales nor calib_batches supplied): the signal
            # callers (video.py) use to auto-recalibrate on real inputs
            # WITHOUT clobbering deliberately-provided calibration.
            self.default_calibration = (
                act_scales is None and calib_batches is None
            )
            if act_scales is None:
                if calib_batches is None:
                    calib_batches = [quant.default_calibration_batch()]
                act_scales = quant.calibrate_scales(
                    params, calib_batches, scale_factor
                )
            only = {
                "tail": quant.is_tail_module,
                "ups": quant.is_ups_module,
                "trunk": quant.is_trunk_module,
                "full": None,
            }[mode]
            # Scales ride inside the param pytree as jit INPUTS — same dict
            # keys => same tree structure => recalibration never recompiles.
            params = {
                "q": quant.quantize_generator_params(params, only=only),
                "s": dict(act_scales),
            }
            glue = dtype
            qmodel = self.model

            def _quant_apply(p, x, valid_hw=None):
                if valid_hw is None:
                    return quant.sr_quant_forward(
                        p["q"], p["s"], x, scale_factor, glue_dtype=glue
                    )
                # Bucketed-exact path (tail mode only): canonical masked
                # float trunk + int8 tail with pad re-zeroing.
                return quant.sr_quant_forward_masked(
                    qmodel, p["q"], p["s"], x, valid_hw, glue_dtype=glue
                )

            self._apply = _quant_apply
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
            repl = NamedSharding(mesh, P())
            self.params = jax.device_put(params, repl)
            jit_kwargs = dict(
                in_shardings=(repl, self._batch_sharding),
                out_shardings=self._batch_sharding,
            )
        else:
            self._batch_sharding = None
            self.params = jax.device_put(params)
            jit_kwargs = {}

        # Measured-tuned PJRT compiler options for the SR forward
        # (utils/xla_opts.py: +7.4% on v5e from a 48 MiB scoped-VMEM
        # budget; FASTSR_COMPILER_OPTIONS env overrides/disables).
        from fast_srgan_tpu.utils.xla_opts import tuned_compiler_options

        copts = tuned_compiler_options()
        if copts:
            jit_kwargs["compiler_options"] = copts

        @functools.partial(jax.jit, **jit_kwargs)
        def _forward_u8(p, x_u8: jnp.ndarray) -> jnp.ndarray:
            # uint8 normalization in, uint8 out on device (4x fewer D2H
            # bytes); one shared definition with the deployment export.
            return sr_forward_u8(self._apply, p, x_u8)

        self._forward_u8 = _forward_u8

        @functools.partial(jax.jit, **jit_kwargs)
        def _forward_f32(p, x: jnp.ndarray) -> jnp.ndarray:
            return self._apply(p, x)

        self._forward_f32 = _forward_f32

        if mesh is not None:
            repl = NamedSharding(mesh, P())
            masked_jit_kwargs = dict(
                in_shardings=(
                    repl, self._batch_sharding,
                    self._batch_sharding, self._batch_sharding,
                ),
                out_shardings=self._batch_sharding,
            )
        else:
            masked_jit_kwargs = {}
        if copts:
            masked_jit_kwargs["compiler_options"] = copts

        @functools.partial(jax.jit, **masked_jit_kwargs)
        def _forward_u8_masked(p, x_u8, valid_h, valid_w):
            from fast_srgan_tpu.ops.norm import valid_mask_nhwc

            mask, _ = valid_mask_nhwc(
                x_u8.shape[1], x_u8.shape[2], valid_h, valid_w
            )
            # Normalize, then re-zero: the [-1,1] mapping sends padding's
            # uint8 zeros to -1, but the masked forward needs exact zeros.
            x = (x_u8.astype(jnp.float32) / 127.5 - 1.0) * mask
            y = self._apply(p, x, valid_hw=(valid_h, valid_w))
            return ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)

        self._forward_u8_masked = _forward_u8_masked

    def recalibrate(self, batches: Iterable[Any]) -> None:
        """Recompute int8 activation scales from sample inputs.

        Scales are jit inputs (see `__init__`), so this swaps numbers into
        the already-compiled programs — no recompilation. Use when the
        content distribution shifts (e.g. a new video stream) or to replace
        the synthetic default calibration with real frames. Clears
        `default_calibration`: after an explicit recalibration the scales
        are caller-chosen and auto-calibrating paths (video.py) must not
        overwrite them.
        """
        if not self.quantize:
            raise ValueError("recalibrate() requires quantize=True")
        self.default_calibration = False
        from fast_srgan_tpu import quant

        scales = quant.calibrate_scales(
            self._float_params, batches, self.SCALE
        )
        new_params = {"q": self.params["q"], "s": scales}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            new_params = jax.device_put(
                new_params, NamedSharding(self.mesh, P())
            )
        else:
            new_params = jax.device_put(new_params)
        self.params = new_params

    def _put_batch(self, arr) -> jnp.ndarray:
        """Batch-dim-sharded device put (any rank with batch leading)."""
        if self._batch_sharding is not None:
            return jax.device_put(np.asarray(arr), self._batch_sharding)
        return jnp.asarray(arr)

    # -- batch-size policy ----------------------------------------------------

    def effective_batch_size(self, h: int, w: int, requested: int = 8) -> int:
        """The batch size the engine actually compiles for an HxW LR frame.

        Two measured v5e constraints (see class docstring / PIXEL_BUDGET
        note): (a) never compile batch 2..7 — pad up to 8 or drop to 1;
        (b) cap total LR pixels per device at `pixel_budget` so the widest
        intermediate fits HBM (e.g. 720x1280 frames force batch 1). With a
        mesh, the policy applies to the per-device shard and the result is
        the global batch (a multiple of the mesh size).
        """
        n_dev = self.mesh.size if self.mesh is not None else 1
        per_req = max(1, requested // n_dev)
        cap = max(1, self.pixel_budget // max(1, h * w))
        per = max(1, min(per_req, cap))
        if 2 <= per <= 7:
            per = 8 if cap >= 8 else 1
        return per * n_dev

    # -- core ---------------------------------------------------------------

    def upscale_batch(self, batch_u8: np.ndarray) -> np.ndarray:
        """[B, H, W, 3] uint8 -> [B, s*H, s*W, 3] uint8 (s = SCALE).

        Compiled batch sizes follow :meth:`effective_batch_size`: an input
        batch of 2..7 runs zero-padded to the compiled size (instance norm
        is per-sample, so padding samples cannot affect real ones), and a
        batch larger than the per-device pixel budget is split into chunks.
        """
        b, h, w, _ = batch_u8.shape
        if b == 0:
            s = self.SCALE
            return np.empty((0, h * s, w * s, 3), np.uint8)
        # The compiled program runs at the bucket-padded dims, so the batch
        # policy (pixel budget, 2..7 avoidance) must be computed from them —
        # otherwise a just-over-bucket frame (e.g. 520x920 -> 1024x1024) gets
        # a batch sized for the smaller unpadded area, overshooting the HBM
        # budget, and compiles a different batch size than _grouped_upscale
        # picks for the identical bucket shape.
        if self.bucket:
            ph, pw = _round_up(h, self.bucket), _round_up(w, self.bucket)
        else:
            ph, pw = h, w
        eff = self.effective_batch_size(ph, pw, b)
        if b != eff:
            if b < eff:  # pad 2..7 up to the compiled batch (8 per device)
                pad = eff - b
                padded = np.concatenate([batch_u8, batch_u8[-1:].repeat(pad, 0)])
                return self.upscale_batch(padded)[:b]
            # over budget: split into chunks the device can hold
            return np.concatenate(
                [
                    self.upscale_batch(batch_u8[i : i + eff])
                    for i in range(0, b, eff)
                ]
            )
        if self.bucket:
            # Always the masked program when bucketing — also for shapes
            # already on the grid: _grouped_upscale compiles masked programs
            # for every bucket shape, and a second unmasked compile of the
            # same shape would cost another 20-240s through the TPU tunnel
            # (and disagree in the last uint8 bit across the two APIs).
            if (ph, pw) != (h, w):
                batch_u8 = np.pad(
                    batch_u8, ((0, 0), (0, ph - h), (0, pw - w), (0, 0))
                )
            out = self._forward_u8_masked(
                self.params,
                self._put_batch(batch_u8),
                self._put_batch(np.full(b, h, np.int32)),
                self._put_batch(np.full(b, w, np.int32)),
            )
            return np.asarray(out)[:, : h * self.SCALE, : w * self.SCALE, :]
        out = self._forward_u8(self.params, self._put_batch(batch_u8))
        out = np.asarray(out)
        return out[:, : h * self.SCALE, : w * self.SCALE, :]

    def upscale_float(self, batch: jnp.ndarray) -> jnp.ndarray:
        """[-1,1] float NHWC in, [-1,1] float out (exact, no bucketing)."""
        return self._forward_f32(self.params, batch)

    # -- directory / streaming APIs -----------------------------------------

    def upscale_images(
        self,
        images: Sequence[np.ndarray],
        batch_size: int = 8,
        pad_singletons: bool = False,
    ) -> List[np.ndarray]:
        """Upscale a list of uint8 HWC images, batching same-shape groups.

        pad_singletons: run lone images through the group's full compiled
        batch (zero-padded) instead of a batch-1 program. Serving uses this
        so live traffic only ever compiles one program per shape — a fresh
        TPU compile mid-request costs 20-240s.
        """
        images = list(images)
        outputs: List[np.ndarray] = [None] * len(images)  # type: ignore
        sizes = [im.shape[:2] for im in images]
        for i, out in self._grouped_upscale(
            sizes, lambda i: images[i], batch_size, pad_singletons
        ):
            outputs[i] = out
        return outputs

    def upscale_files(
        self, paths: Sequence[str], batch_size: int = 8
    ) -> Iterator[Tuple[int, np.ndarray]]:
        """Memory-bounded directory path: group by header-declared size and
        decode at most one batch at a time. Yields (original_index, output).
        """
        from PIL import Image

        from fast_srgan_tpu.utils.images import load_image_u8

        sizes = []
        for path in paths:
            with Image.open(path) as im:  # lazy: header only, no decode
                w, h = im.size
            sizes.append((h, w))
        yield from self._grouped_upscale(
            sizes, lambda i: load_image_u8(paths[i]), batch_size
        )

    def _grouped_upscale(
        self, sizes, take, batch_size, pad_singletons: bool = False
    ) -> Iterator[Tuple[int, np.ndarray]]:
        """Shared grouping/batching; trailing partial batches are padded to
        the compiled batch size rather than recompiled. Groups by exact
        shape, or — with bucketing on — by bucket shape, so heterogeneous
        sizes share both programs and batches (each sample zero-padded and
        upscaled exactly via the masked forward, then cropped). Yields
        (original_index, upscaled) as each batch completes.

        Pipelined: one batch stays in flight — JAX async dispatch lets the
        host decode/stack batch t+1 while the device runs batch t (the
        fetch of t's output is deferred until t+1 is dispatched; the same
        discipline as stream(), which keeps its own copy because frame
        sizes there are unknown upfront). If decoding or dispatching t+1
        fails, t's completed outputs are still yielded before the error
        propagates."""
        pending: List[Tuple[Any, List[Tuple[int, Tuple[int, int]]]]] = []

        def fetch(entry):
            dev, metas = entry
            host = np.asarray(dev)
            return [
                (i, host[j, : h * self.SCALE, : w * self.SCALE])
                for j, (i, (h, w)) in enumerate(metas)
            ]

        order: Dict[Tuple[int, int], List[int]] = {}
        for i, hw in enumerate(sizes):
            key = tuple(
                _round_up(v, self.bucket) if self.bucket else v for v in hw
            )
            order.setdefault(key, []).append(i)
        for (ph, pw), idxs in order.items():
            eff = self.effective_batch_size(ph, pw, batch_size)
            for start in range(0, len(idxs), eff):
                chunk = idxs[start : start + eff]
                # Compiled batch per effective_batch_size: a lone image uses
                # the batch-1 program; any other chunk is padded to `eff`
                # (both avoids the pathological 2..7 batch lowerings and
                # reuses the full-chunk program for trailing partials).
                # On a mesh the batch dim must divide the device axis, so
                # the batch-1 shortcut is never valid there.
                compiled = (
                    1
                    if (
                        self.mesh is None
                        and not pad_singletons
                        and len(chunk) == 1
                        and len(idxs) <= eff
                    )
                    else eff
                )
                pad = compiled - len(chunk)
                try:
                    if self.bucket:
                        imgs = []
                        for i in chunk:
                            im = take(i)
                            h, w = im.shape[:2]
                            imgs.append(
                                np.pad(im, ((0, ph - h), (0, pw - w), (0, 0)))
                            )
                        batch = np.stack(imgs)
                        vh = np.array([sizes[i][0] for i in chunk], np.int32)
                        vw = np.array([sizes[i][1] for i in chunk], np.int32)
                        if pad:
                            batch = np.concatenate(
                                [batch, batch[-1:].repeat(pad, 0)]
                            )
                            vh = np.concatenate([vh, vh[-1:].repeat(pad)])
                            vw = np.concatenate([vw, vw[-1:].repeat(pad)])
                        dev = self._forward_u8_masked(
                            self.params, self._put_batch(batch),
                            self._put_batch(vh), self._put_batch(vw),
                        )
                    else:
                        batch = np.stack([take(i) for i in chunk])
                        if pad:
                            batch = np.concatenate(
                                [batch, batch[-1:].repeat(pad, 0)]
                            )
                        # chunk is already policy-sized+padded, so call the
                        # compiled program directly (upscale_batch would
                        # only re-derive the same compiled size; mesh
                        # divisibility is guaranteed because `compiled` is
                        # never 1 when a mesh is set)
                        dev = self._forward_u8(
                            self.params, self._put_batch(batch)
                        )
                except Exception:
                    # a corrupt file / failed compile for THIS chunk must
                    # not discard the previous chunk's finished outputs
                    for entry in pending:
                        yield from fetch(entry)
                    pending.clear()
                    raise
                pending.append((dev, [(i, sizes[i]) for i in chunk]))
                if len(pending) > 1:
                    yield from fetch(pending.pop(0))
        for entry in pending:
            yield from fetch(entry)

    def stream(
        self, frames: Iterable[np.ndarray], batch_size: int = 8
    ) -> Iterator[np.ndarray]:
        """Stream uint8 HWC frames through the engine with pipelining.

        Keeps one batch in flight: JAX async dispatch lets the host stack and
        enqueue batch t+1 while the device runs batch t — the reference's
        blocking `.cpu()` per frame (inference.py:53) is the anti-pattern this
        replaces.

        The compiled batch follows :meth:`effective_batch_size` for the
        stream's frame size: e.g. 540x960 (4K-output) frames stream at
        batch 8 (32.7 fps/chip measured), while 720x1280 frames drop to
        batch 1 because batch 8 exceeds the device pixel budget.
        """
        pending: List[Tuple[int, jnp.ndarray]] = []
        buf: List[np.ndarray] = []

        def flush():
            valid = len(buf)
            batch = np.stack(buf)
            buf.clear()
            if valid < batch_size:
                # Pad the trailing partial batch to the compiled batch size:
                # a fresh (valid, H, W, 3) signature would trigger a full
                # 20-240s generator recompile at the end of every stream.
                pad = batch_size - valid
                batch = np.concatenate([batch, batch[-1:].repeat(pad, 0)])
            out = self._forward_u8(self.params, self._put_batch(batch))
            pending.append((valid, out))

        first = True
        for frame in frames:
            if first:  # fix the compiled batch from the stream's frame size
                batch_size = self.effective_batch_size(
                    frame.shape[0], frame.shape[1], batch_size
                )
                first = False
            buf.append(frame)
            if len(buf) == batch_size:
                flush()
            while len(pending) > 2:  # bound in-flight memory
                n, dev = pending.pop(0)
                host = np.asarray(dev)
                for k in range(n):
                    yield host[k]
        if buf:
            flush()
        for n, dev in pending:
            host = np.asarray(dev)
            for k in range(n):
                yield host[k]
