"""Shared utilities: image IO, logging, seeding."""

from fast_srgan_tpu.utils.images import list_image_files, load_image_u8, save_image_u8

__all__ = ["list_image_files", "load_image_u8", "save_image_u8"]
