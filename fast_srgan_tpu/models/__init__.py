"""Flax model zoo: SRGAN generator, PatchGAN discriminator, VGG19 features."""

from fast_srgan_tpu.models.generator import Generator, PReLU
from fast_srgan_tpu.models.discriminator import Discriminator
from fast_srgan_tpu.models.vgg import VGG19Features

__all__ = ["Generator", "PReLU", "Discriminator", "VGG19Features"]
