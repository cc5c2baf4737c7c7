"""Pallas TPU kernels for the generator's fused hot ops.

The reference's native-performance tier is `torch.compile(mode="max-autotune")`
(reference trainer.py:23-26, off by default); the TPU equivalent here is
hand-fused Pallas kernels behind `kernels.use_pallas`, with `lax` reference
implementations and numerical tests (SURVEY.md §7.11). The convs themselves
stay on XLA (its TPU conv emitters are already MXU-optimal); Pallas targets
the memory-bound elementwise/reduction seams: instance-norm statistics +
normalize + PReLU in one VMEM residency (whole-block kernel) or as a chunked
double-buffered DMA stream (any activation size).

Measured status (v5e, 800-frame bench): XLA's own fusion of the lax
composition currently WINS end-to-end (225 FPS vs 180 FPS with the chunked
kernel in the stem) — instance norm is inherently two HBM sweeps and XLA
overlaps them with the surrounding convs better than an opaque custom call.
`use_pallas` therefore defaults to False; the kernels remain as the
maintained, tested custom-kernel tier (and the dispatch/VJP scaffolding for
future kernels that do beat XLA).
"""

from fast_srgan_tpu.kernels.instance_norm import instance_norm_prelu_nhwc

__all__ = ["instance_norm_prelu_nhwc"]
