"""TPU-native core ops: layout-aware primitives shared by models and pipeline."""

from fast_srgan_tpu.ops.augment import augment_dihedral
from fast_srgan_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc
from fast_srgan_tpu.ops.norm import instance_norm_nhwc
from fast_srgan_tpu.ops.resize import resize_bicubic_nhwc, bicubic_resize_matrix

__all__ = [
    "augment_dihedral",
    "pixel_shuffle_nhwc",
    "instance_norm_nhwc",
    "resize_bicubic_nhwc",
    "bicubic_resize_matrix",
]
