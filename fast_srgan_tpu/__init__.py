"""fast_srgan_tpu — a TPU-native super-resolution GAN framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
HasnainRaz/Fast-SRGAN (reference: /root/reference): a 4x single-image
super-resolution GAN (SRGAN-style) with

  * a ~926K-param residual CNN generator with pixel-shuffle upsampling
    (reference: model.py:72-117),
  * a PatchGAN-style strided CNN discriminator (reference: model.py:139-193),
  * VGG19 perceptual loss (reference: model.py:5-23),
  * two-phase training (L1 pretrain -> adversarial GAN; reference trainer.py),
  * real-time batched inference on images/video frames (reference inference.py),

redesigned TPU-first: NHWC layouts, jitted functional train steps, data
parallelism over a `jax.sharding.Mesh`, spatial halo-exchange tiling for
large-frame inference, bf16 mixed precision, and Pallas kernels for the
fused hot ops.
"""

__version__ = "0.1.0"

__all__ = [
    "Generator",
    "Discriminator",
    "VGG19Features",
    "SRInferenceEngine",
    "arch_from_params",
    "Trainer",
    "load_config",
    "make_server",
    "tiled_upscale_u8",
]


def __getattr__(name):  # lazy top-level API (keeps bare import light)
    if name in ("Generator", "Discriminator", "VGG19Features"):
        import fast_srgan_tpu.models as models

        return getattr(models, name)
    if name == "SRInferenceEngine":
        from fast_srgan_tpu.inference import SRInferenceEngine

        return SRInferenceEngine
    if name == "arch_from_params":
        from fast_srgan_tpu.inference import arch_from_params

        return arch_from_params
    if name == "Trainer":
        from fast_srgan_tpu.train.trainer import Trainer

        return Trainer
    if name == "load_config":
        from fast_srgan_tpu.config import load_config

        return load_config
    if name == "make_server":
        from fast_srgan_tpu.serving import make_server

        return make_server
    if name == "tiled_upscale_u8":
        from fast_srgan_tpu.parallel.spatial import tiled_upscale_u8

        return tiled_upscale_u8
    raise AttributeError(name)
