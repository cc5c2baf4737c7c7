"""One-time dataset preprocessing: images -> raw uint8 .npy cache.

Capability parity with the reference's ``write_images_to_numpy_arrays``
(/root/reference/train.py:22-37): every ``.png`` under ``image_dir`` is
decoded to RGB uint8 and saved as ``.npy`` under ``numpy_dir`` using a
16-thread pool, triggered lazily when the cache directory does not exist
(reference train.py:48-56).

Differences (deliberate): arrays are stored HWC (the TPU-native layout; the
reference stores CHW for torch), and jpg/jpeg are accepted alongside png.
The cache exists so training-time random crops are a cheap mmap slice with no
image decode on the hot path (reference dataloader.py:25 uses
``mmap_mode="c"`` for the same reason).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from fast_srgan_tpu.utils.images import list_image_files, load_image_u8


def write_images_to_numpy(
    image_dir: str, numpy_dir: str, workers: int = 16, verbose: bool = True
) -> int:
    """Decode every image in image_dir into an HWC uint8 .npy in numpy_dir."""
    # List images BEFORE creating the cache dir: a typo'd image_dir must not
    # leave behind an empty cache that masks the error on later runs.
    names = list_image_files(image_dir)
    os.makedirs(numpy_dir, exist_ok=True)

    def _write(name: str) -> None:
        stem = os.path.splitext(name)[0]
        arr = load_image_u8(os.path.join(image_dir, name))
        np.save(os.path.join(numpy_dir, stem + ".npy"), arr)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(_write, names))
    if verbose:
        print(f"Preprocessed {len(names)} images -> {numpy_dir}")
    return len(names)


def ensure_numpy_cache(image_dir: str, numpy_dir: str, workers: int = 16) -> None:
    """Lazily build the cache when missing OR empty (the reference only
    checks existence — train.py:48-56 — so an interrupted/failed first run
    leaves an empty dir that permanently skips preprocessing)."""
    if os.path.isdir(numpy_dir) and any(
        f.endswith(".npy") for f in os.listdir(numpy_dir)
    ):
        return
    write_images_to_numpy(image_dir, numpy_dir, workers)
