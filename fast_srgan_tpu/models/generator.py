"""The 4x super-resolution generator (TPU-native, NHWC).

Capability parity with the reference generator (/root/reference/model.py:72-117):

  neck:       Conv 3->F (k3, p1) + PReLU                      (model.py:75-78)
  stem:       n_layers x ResidualBlock                        (model.py:79-84)
                Conv(k3, no bias) -> InstanceNorm -> PReLU
                -> Conv(no bias) -> InstanceNorm -> + x       (model.py:43-69)
  bottleneck: Conv(no bias) -> InstanceNorm, + long skip      (model.py:86-95,115)
  upsampling: 2 x [Conv F->4F (k3) -> PixelShuffle(2) -> PReLU]  fixed 4x
                                                              (model.py:26-40,97-100)
  head:       Conv F->3 (k3) + tanh -> output in [-1, 1]      (model.py:102-110)

Default config (n_filters=64, n_layers=8) has exactly 925,646 parameters,
matching the shipped reference checkpoint.

TPU-first choices: NHWC activations (native conv layout), explicit (1,1)
padding (bit-identical to torch's p=1), fp32 params with a configurable
compute dtype (bf16 by default in training), instance-norm statistics in fp32,
and an optional Pallas fused instance-norm+PReLU path for the stem
(`use_pallas=True`). The network is fully convolutional: any H, W works and
the output is [B, 4H, 4W, 3].
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from fast_srgan_tpu.ops.norm import (
    instance_norm_masked_nhwc,
    instance_norm_nhwc,
    valid_mask_nhwc,
)
from fast_srgan_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc

PAD1 = ((1, 1), (1, 1))


class PReLUAlpha(nn.Module):
    """Owns a PReLU slope param (so fused kernels share the PReLU tree path)."""

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("alpha", lambda _: jnp.full((1,), 0.25, jnp.float32))


class Conv3x3Params(nn.Module):
    """Owns a 3x3 conv's kernel/bias params (flax nn.Conv-compatible paths
    and initializers) for fused kernels that bypass nn.Conv's forward."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class PReLU(nn.Module):
    """PReLU with a single shared slope, init 0.25 (torch nn.PReLU default)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", lambda _: jnp.full((1,), 0.25, jnp.float32))
        alpha = alpha.astype(self.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class ResidualBlock(nn.Module):
    """conv -> IN -> PReLU -> conv -> IN, identity skip after the 2nd norm."""

    n_filters: int
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None, count=None) -> jnp.ndarray:
        norm = (
            instance_norm_nhwc if mask is None
            else lambda t: instance_norm_masked_nhwc(t, mask, count)
        )
        y = nn.Conv(
            self.n_filters, (3, 3), padding=PAD1, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        if self.use_pallas:
            if mask is not None:
                raise ValueError("use_pallas does not support masked norms")
            from fast_srgan_tpu.kernels.instance_norm import (
                instance_norm_prelu_nhwc,
            )
            # Same param path as the unfused PReLU ("relu1/alpha") so the two
            # variants load identical checkpoints.
            alpha = PReLUAlpha(name="relu1")()
            y = instance_norm_prelu_nhwc(y, alpha)
        else:
            y = norm(y)
            y = PReLU(dtype=self.dtype, name="relu1")(y)
        y = nn.Conv(
            self.n_filters, (3, 3), padding=PAD1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = norm(y)
        return y + x


class UpSamplingBlock(nn.Module):
    """Conv F->4F (k3) -> PixelShuffle(2) -> PReLU — one 2x stage.

    With ``fused=True`` the whole stage runs as one Mosaic kernel
    (kernels/fused_upsample.py — experimental tier: exact, trainable via a
    lax-composition VJP, currently ~10% behind XLA's fusion; see the kernel
    docstring for measured numbers). Param tree is identical either way.
    """

    n_filters: int
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None) -> jnp.ndarray:
        if self.fused:
            if mask is not None:
                raise ValueError("fused upsample does not support masking")
            from fast_srgan_tpu.kernels.fused_upsample import fused_upsample

            # Own the same param paths as the unfused variant (conv/kernel,
            # conv/bias, relu/alpha) so checkpoints are interchangeable.
            kernel, bias = Conv3x3Params(
                self.n_filters * 4, x.shape[-1], name="conv"
            )()
            alpha = PReLUAlpha(name="relu")()
            return fused_upsample(x, kernel, bias, alpha)
        x = nn.Conv(
            self.n_filters * 4, (3, 3), padding=PAD1, dtype=self.dtype,
            name="conv",
        )(x)
        if mask is not None:
            # Re-zero the padding the conv bias just filled in; the shuffle
            # then propagates exact zeros to the 2x grid.
            x = x * mask.astype(x.dtype)
        x = pixel_shuffle_nhwc(x, 2)
        return PReLU(dtype=self.dtype, name="relu")(x)


class Generator(nn.Module):
    """Fully-convolutional 4x SR generator. Input/output in [-1, 1], NHWC."""

    n_filters: int = 64
    n_layers: int = 8
    # Total upscale = 2^(number of upsample stages). The reference hardcodes
    # 4x (model.py:97-100 — its data.scale_factor key never reaches the
    # model); here it is honored: 2, 4, or 8. The shipped checkpoints are
    # scale_factor=4 (two stages).
    scale_factor: int = 4
    dtype: Any = jnp.float32
    use_pallas: bool = False
    # Run each upsample stage as the fully-fused Mosaic kernel (experimental
    # tier; see kernels/fused_upsample.py for measured status).
    fused_upsample: bool = False
    # Rematerialize residual blocks in the backward pass: activations of the
    # stem are recomputed instead of stored, trading ~2x stem FLOPs for
    # O(n_layers) less HBM — the standard lever for scaled configs (more
    # blocks/filters, larger crops) on a fixed-HBM chip.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        trunk_only: bool = False,
        valid_hw=None,
    ) -> jnp.ndarray:
        """Full forward, or (``trunk_only=True``, a static trace-time flag)
        just neck -> stem -> bottleneck (+ long skip) — everything before the
        upsampling tail, at LR resolution. The LR-domain tail transform
        (ops/lr_tail.py) reuses the trunk via
        ``Generator.apply(params, x, trunk_only=True)``; the unused tail
        params in the tree are ignored by flax.

        ``valid_hw`` = (valid_h, valid_w) int32 [B] arrays enables the exact
        zero-pad-masked forward for shape-bucketed batches: ``x`` must be
        zero outside each sample's valid region, norm statistics reduce over
        the valid region only, and padding is re-zeroed after every bias/norm
        so each valid output pixel is exactly what the unpadded forward
        produces (padding only ever supplies the zeros the true image edge's
        conv padding would) — see tests/test_masked.py. Padded regions of
        the *output* are garbage; the caller crops.
        """
        x = x.astype(self.dtype)
        if valid_hw is not None:
            mask, count = valid_mask_nhwc(
                x.shape[1], x.shape[2], valid_hw[0], valid_hw[1]
            )
            maskc = mask.astype(self.dtype)
        else:
            mask = count = maskc = None
        residual = nn.Conv(
            self.n_filters, (3, 3), padding=PAD1, dtype=self.dtype,
            name="neck_conv",
        )(x)
        if maskc is not None:
            residual = residual * maskc  # re-zero what the bias filled in
        residual = PReLU(dtype=self.dtype, name="neck_relu")(residual)

        block_cls = nn.remat(ResidualBlock) if self.remat else ResidualBlock
        y = residual
        for i in range(self.n_layers):
            y = block_cls(
                self.n_filters, dtype=self.dtype, use_pallas=self.use_pallas,
                name=f"stem_{i}",
            )(y, mask, count)

        y = nn.Conv(
            self.n_filters, (3, 3), padding=PAD1, use_bias=False,
            dtype=self.dtype, name="bottleneck_conv",
        )(y)
        y = (
            instance_norm_nhwc(y) if mask is None
            else instance_norm_masked_nhwc(y, mask, count)
        )
        y = y + residual  # long skip (reference model.py:115)
        if trunk_only:
            return y

        n_stages = {2: 1, 4: 2, 8: 3}.get(self.scale_factor)
        if n_stages is None:
            raise ValueError(
                f"scale_factor must be 2, 4, or 8; got {self.scale_factor}"
            )
        for i in range(n_stages):
            y = UpSamplingBlock(
                self.n_filters, dtype=self.dtype,
                fused=self.fused_upsample, name=f"upsampling_{i}",
            )(y, maskc)
            if maskc is not None and i + 1 < n_stages:
                # The shuffle doubled the grid; rebuild the mask at the new
                # resolution for the next stage's post-conv re-zeroing.
                maskc, _ = valid_mask_nhwc(
                    y.shape[1], y.shape[2],
                    valid_hw[0] * (2 ** (i + 1)), valid_hw[1] * (2 ** (i + 1)),
                )
                maskc = maskc.astype(self.dtype)

        y = nn.Conv(
            3, (3, 3), padding=PAD1, dtype=self.dtype, name="head_conv"
        )(y)
        # No final mask: valid output pixels only read masked inputs, and the
        # caller crops the padded margin away.
        return jnp.tanh(y.astype(jnp.float32))
