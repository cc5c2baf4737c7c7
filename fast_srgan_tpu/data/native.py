"""ctypes binding for the native C++ crop-extraction backend (csrc/).

Builds ``libfastsr_loader.so`` from source on first use (g++ is in the
image; no pybind11 needed — the ABI is 5 plain C functions). The backend is
optional: :class:`~fast_srgan_tpu.data.pipeline.CropSampler` transparently
falls back to numpy mmap slicing when the toolchain or the .so is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "fastsr_loader.cpp")
_LIB = os.path.join(_REPO_ROOT, "csrc", "libfastsr_loader.so")
_build_lock = threading.Lock()


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    with _build_lock:
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
        # Compile to a per-process temp name and os.rename (atomic on POSIX):
        # the lock only covers threads, and concurrent *processes* racing on
        # the same -o target could dlopen a half-written .so.
        tmp = f"{_LIB}.tmp.{os.getpid()}"
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-o", tmp, _SRC, "-lpthread"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, _LIB)
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    return _LIB


_lib_handle = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib_handle, _lib_failed
    if _lib_handle is not None or _lib_failed:
        return _lib_handle
    path = _build() if os.path.exists(_SRC) else None
    if path is None:
        _lib_failed = True
        return None
    lib = ctypes.CDLL(path)
    lib.fsr_open.restype = ctypes.c_void_p
    lib.fsr_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32]
    lib.fsr_close.argtypes = [ctypes.c_void_p]
    lib.fsr_num_files.restype = ctypes.c_int32
    lib.fsr_num_files.argtypes = [ctypes.c_void_p]
    lib.fsr_shapes.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_int64)]
    lib.fsr_crop_batch.restype = ctypes.c_int32
    lib.fsr_crop_batch.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
    ]
    _lib_handle = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeCropDataset:
    """Native mmap'd view over uint8 HWC .npy files with batch crop gather."""

    def __init__(self, paths: Sequence[str], threads: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (no g++ / build failed)")
        self._lib = lib
        self.threads = threads
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        self._handle = lib.fsr_open(arr, len(paths))
        if not self._handle:
            raise RuntimeError(
                "fsr_open failed (unreadable file or unsupported .npy layout)"
            )
        n = lib.fsr_num_files(self._handle)
        hw = (ctypes.c_int64 * (2 * n))()
        lib.fsr_shapes(self._handle, hw)
        self.shapes = np.array(hw, dtype=np.int64).reshape(n, 2)

    def crop_batch(
        self, file_idx: np.ndarray, tops: np.ndarray, lefts: np.ndarray,
        crop: int,
    ) -> np.ndarray:
        batch = len(file_idx)
        out = np.empty((batch, crop, crop, 3), np.uint8)
        # Thread spawn costs ~50us each; only fan out when there is enough
        # memcpy work to amortize it (cold page-fault-heavy gathers benefit,
        # small warm-cache batches don't).
        threads = self.threads if out.nbytes >= (1 << 22) else 1
        rc = self._lib.fsr_crop_batch(
            self._handle,
            np.ascontiguousarray(file_idx, np.int32),
            np.ascontiguousarray(tops, np.int32),
            np.ascontiguousarray(lefts, np.int32),
            batch, crop, out, threads,
        )
        if rc != 0:
            raise ValueError("fsr_crop_batch: index or offset out of range")
        return out

    def close(self) -> None:
        if self._handle:
            self._lib.fsr_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
