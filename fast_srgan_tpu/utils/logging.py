"""TensorBoard logging with the reference's exact tag schema.

Tag schema parity (SURVEY.md §5; reference trainer.py):
  scalars: Pretrain/Generator/Loss, Loss/Discriminator/Real,
           Loss/Discriminator/Fake, Loss/Generator/Adversarial,
           Loss/Generator/Content, {phase}/SSIM, {phase}/PSNR
  images : {phase}/HighRes, {phase}/Bicubic (step 0),
           Pretrain/Generated, GAN/Generated

Backed by torch's SummaryWriter (tensorboard is in the image); falls back to
a JSONL metric log when unavailable so training never hard-depends on it.
"""

from __future__ import annotations

import json
import os
import time
import numpy as np


class MetricsWriter:
    """SummaryWriter facade taking NHWC float [0,1] images and scalars."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # noqa: PLC0415

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), global_step=step)
        self._jsonl.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "time": time.time()}
            )
            + "\n"
        )

    def images(self, tag: str, images01: np.ndarray, step: int) -> None:
        """images01: [N, H, W, C] float in [0, 1]."""
        if self._tb is not None:
            arr = np.clip(np.asarray(images01, dtype=np.float32), 0.0, 1.0)
            self._tb.add_images(tag, arr, global_step=step, dataformats="NHWC")

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self) -> None:
        self.flush()
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
