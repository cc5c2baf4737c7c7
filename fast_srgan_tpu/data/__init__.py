"""Input pipeline: preprocessing cache + host-side crop sampler.

TPU-first split of responsibilities (vs the reference's 16-process PyTorch
DataLoader doing decode+crop+bicubic+normalize on host — reference
train.py:81-113, dataloader.py:24-38):

  host   : mmap .npy -> random uint8 HR crop -> pinned batch   (cheap)
  device : uint8 -> float, bicubic-antialias downsample (MXU matmuls),
           [-1,1] normalize — fused into the jitted train step (free)

Only uint8 HR crops cross host->device (4x fewer bytes than the reference's
fp32 LR+HR pair) and the bicubic work rides the MXU instead of host cores.
"""

from fast_srgan_tpu.data.preprocess import write_images_to_numpy
from fast_srgan_tpu.data.pipeline import CropSampler, PrefetchLoader, make_loaders

__all__ = [
    "write_images_to_numpy",
    "CropSampler",
    "PrefetchLoader",
    "make_loaders",
]
