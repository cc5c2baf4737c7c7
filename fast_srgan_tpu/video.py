"""Streaming video super-resolution (real video files, not just frame dirs).

The reference's "video" support is per-frame image-directory processing at
batch 1 with a host sync per frame (reference inference.py:47-57, README
markets 720p "video upscaling"). This module is the production path the
reference lacks: decode -> batched jitted 4x upscale -> encode, with the
decoder thread, the device pipeline (JAX async dispatch, bounded in-flight
window), and the encoder all overlapping.

cv2 (OpenCV) does the container/codec work; frames are converted BGR<->RGB
around the engine (the network is trained on RGB).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from fast_srgan_tpu.inference import SRInferenceEngine


def _decode_frames(
    path: str, frame_queue: queue.Queue, limit: Optional[int],
    stop: threading.Event,
) -> None:
    # The import and capture-open live INSIDE the try: if either fails
    # (no opencv, corrupt backend), the finally must still enqueue the
    # None sentinel or the consumer blocks forever on q.get().
    cap = None
    error = None
    try:
        import cv2

        cap = cv2.VideoCapture(path)
        n = 0
        while cap.isOpened() and not stop.is_set():
            if limit is not None and n >= limit:
                break
            ok, frame_bgr = cap.read()
            if not ok:
                break
            item = frame_bgr[:, :, ::-1]  # BGR -> RGB
            # put with teardown polling: if the consumer abandoned the
            # generator, the thread must not block forever holding the
            # decoder handle and ~64 buffered frames.
            while not stop.is_set():
                try:
                    frame_queue.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue
            n += 1
    except BaseException as e:  # surfaced to the consumer, not swallowed
        error = e
    finally:
        if cap is not None:
            cap.release()
        sentinel = error if error is not None else None
        while True:
            try:
                frame_queue.put(sentinel, timeout=0.1)
                break
            except queue.Full:
                if stop.is_set():
                    break


def iter_video_frames(
    path: str, limit: Optional[int] = None, buffer: int = 64
) -> Iterator[np.ndarray]:
    """Decode RGB uint8 frames on a background thread (bounded queue)."""
    q: queue.Queue = queue.Queue(maxsize=max(1, buffer))
    stop = threading.Event()
    t = threading.Thread(
        target=_decode_frames, args=(path, q, limit, stop), daemon=True
    )
    t.start()
    try:
        while True:
            frame = q.get()
            if frame is None:
                break
            if isinstance(frame, BaseException):
                raise frame  # decoder-thread failure (e.g. missing opencv)
            yield frame
    finally:
        stop.set()  # runs on GeneratorExit too (abandoned consumer)


def upscale_video(
    engine: SRInferenceEngine,
    input_path: str,
    output_path: str,
    batch_size: int = 8,
    limit: Optional[int] = None,
    codec: str = "mp4v",
) -> dict:
    """Upscale a video file. Returns {frames, fps_in, seconds}.

    The single-stream case of :func:`upscale_videos` (one probe/writer/
    stream implementation for both)."""
    stats = upscale_videos(
        engine, [input_path], [output_path],
        batch_size=batch_size, limit=limit, codec=codec,
    )
    return {
        "frames": stats["frames"],
        "fps_in": stats["fps_in"][0],
        "seconds": stats["seconds"],
    }


def upscale_videos(
    engine: SRInferenceEngine,
    input_paths: list,
    output_paths: list,
    batch_size: int = 8,
    limit: Optional[int] = None,
    codec: str = "mp4v",
) -> dict:
    """Upscale N video streams concurrently through ONE device pipeline.

    Production multi-tenant serving: frames are drawn round-robin from all
    active streams and packed into shared batches, so one chip serves N
    cameras/clips at full batch efficiency instead of N under-filled
    single-stream pipelines (batch 1..7 compiles are the measured v5e
    pathology — docs/DESIGN.md "Batch-size anatomy"). Per-stream frame
    order is preserved (``SRInferenceEngine.stream`` yields in input
    order, so outputs unzip back by the recorded draw order). All inputs
    must share one frame size — they feed a single compiled program; call
    per size group for mixed fleets (the serving daemon's bucketing is
    the image-side answer). Each stream ends at its own length; remaining
    streams keep batching.

    Returns {frames, per_stream, fps_in, seconds}.
    """
    import collections
    import time

    import cv2

    if len(input_paths) != len(output_paths):
        raise ValueError("input_paths and output_paths must pair up")
    if not input_paths:
        raise ValueError("no input videos")
    if len(set(output_paths)) != len(output_paths):
        # two writers on one file interleave into a corrupt container
        raise ValueError(f"duplicate output paths: {sorted(output_paths)}")
    import os

    in_abs = {os.path.abspath(p) for p in input_paths}
    clash = in_abs & {os.path.abspath(p) for p in output_paths}
    if clash:
        # the writer opens (and truncates) outputs BEFORE decode starts —
        # writing onto an input would destroy it before a frame is read
        raise ValueError(f"output would overwrite an input: {sorted(clash)}")

    sizes, fpses = [], []
    for p in input_paths:
        cap = cv2.VideoCapture(p)
        if not cap.isOpened():
            raise FileNotFoundError(f"cannot open video: {p}")
        fpses.append(cap.get(cv2.CAP_PROP_FPS) or 24.0)
        sizes.append((
            int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        ))
        cap.release()
    if len(set(sizes)) != 1:
        raise ValueError(
            f"all streams must share one frame size, got {sorted(set(sizes))}"
            " — group by size and call once per group"
        )
    w, h = sizes[0]

    # int8 tier: calibrate activation scales on REAL decoded frames (the
    # same policy as image inference — infer.py calibrates on the actual
    # inputs). The first frames of each stream are decoded once extra
    # here (cheap); scales are jit inputs so recalibration never
    # recompiles. Measured A/B vs the synthetic default batch on a test
    # clip (scripts/eval_int8.py --calib_ab, v5e 2026-08-20): -0.24 dB —
    # noise-level and content-specific; the policy buys one calibration
    # story across images/video and robustness to streams the synthetic
    # batch doesn't cover, not a PSNR win (docs/DESIGN.md "Calibration
    # source").
    # Only auto-calibrate engines still on the built-in synthetic batch:
    # caller-supplied act_scales/calib_batches (or an explicit
    # recalibrate()) are deliberate and must not be clobbered by a clip.
    if getattr(engine, "quantize", False) and getattr(
        engine, "default_calibration", False
    ):
        from itertools import islice

        from fast_srgan_tpu import quant

        per = max(1, 8 // len(input_paths))
        first: list = []
        for p in input_paths:
            first.extend(islice(iter_video_frames(p, limit=per), per))
            if len(first) >= 8:
                break
        cb = quant.calibration_batch_from_images(first)
        if cb is not None:
            engine.recalibrate([cb])
            # Still auto-managed: a later call calibrates on ITS streams
            # (recalibrate() cleared the flag to protect explicit calls).
            engine.default_calibration = True

    # Writer size must match the engine's scale exactly: cv2 silently DROPS
    # wrong-sized frames (an empty output that still reports success).
    s = engine.SCALE
    writers = []
    for out_path, fps in zip(output_paths, fpses):
        wr = cv2.VideoWriter(
            out_path, cv2.VideoWriter_fourcc(*codec), fps, (s * w, s * h)
        )
        if not wr.isOpened():
            for other in writers:
                other.release()
            raise RuntimeError(f"cannot open video writer: {out_path}")
        writers.append(wr)

    draw_order: collections.deque = collections.deque()

    def merged():
        # Per-stream decode lookahead bounded so host memory stays ~2
        # batches total across N streams, not N*64 frames.
        buf = max(2, (2 * batch_size + len(input_paths) - 1)
                  // len(input_paths))
        its = [
            iter_video_frames(p, limit, buffer=buf) for p in input_paths
        ]
        active = list(range(len(its)))
        checked = [False] * len(its)
        while active:
            for i in list(active):
                try:
                    frame = next(its[i])
                except StopIteration:
                    active.remove(i)
                    continue
                if not checked[i]:
                    # container props can lie (rotation metadata, stale
                    # headers); a size mismatch would make the writer
                    # silently drop every frame
                    if frame.shape[:2] != (h, w):
                        raise ValueError(
                            f"{input_paths[i]}: decoded frames are "
                            f"{frame.shape[1]}x{frame.shape[0]} but the "
                            f"container reports {w}x{h} (rotation "
                            "metadata?)"
                        )
                    checked[i] = True
                draw_order.append(i)
                yield frame

    start = time.perf_counter()
    per_stream = [0] * len(input_paths)
    try:
        for sr_rgb in engine.stream(merged(), batch_size=batch_size):
            i = draw_order.popleft()
            writers[i].write(np.ascontiguousarray(sr_rgb[:, :, ::-1]))
            per_stream[i] += 1
    finally:
        for wr in writers:
            wr.release()
    return {
        "frames": sum(per_stream),
        "per_stream": per_stream,
        "fps_in": fpses,
        "seconds": time.perf_counter() - start,
    }
