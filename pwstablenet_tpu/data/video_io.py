"""Host-side video decode/encode (SURVEY.md C1 / N-4).

OpenCV's C++ videoio stays on the host side of the device boundary,
exactly as in the reference.  Frames travel host<->device as **uint8
RGB** by default — the decoder's native dtype — and are normalized to
[-1, 1] on-device inside the jitted pipeline step: a 4x cut in
host->device bytes versus shipping float32, which matters both through
this environment's tunnel link and on real hosts at 1080p streaming
rates.  ``dtype=np.float32`` is still accepted everywhere for callers
that want host-side floats (tests, numpy-level tooling).

A background decode thread feeds a bounded queue so decode overlaps
device compute (the "double-buffered device batches" of BASELINE.json:5;
depth set by ``DataConfig.prefetch_depth``).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in this env
    cv2 = None


def _require_cv2():
    if cv2 is None:
        raise RuntimeError("OpenCV (cv2) is required for video I/O")


def read_video(
    path: str, max_frames: int = -1, dtype=np.float32
) -> Tuple[np.ndarray, float]:
    """Decode a whole video -> (frames (T, H, W, 3) RGB, fps).

    dtype float32: values in [-1, 1]; dtype uint8: raw 0..255 (the
    device-transport format — see module docstring)."""
    _require_cv2()
    conv = _to_uint8_rgb if np.dtype(dtype) == np.uint8 else _to_float
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video {path!r}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while max_frames < 0 or len(frames) < max_frames:
        ok, bgr = cap.read()
        if not ok:
            break
        frames.append(conv(bgr))
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path!r}")
    return np.stack(frames), float(fps)


def iter_video(
    path: str, chunk: int, dtype=np.float32
) -> Iterator[np.ndarray]:
    """Stream a video in chunks of ``chunk`` frames (last may be short)."""
    _require_cv2()
    conv = _to_uint8_rgb if np.dtype(dtype) == np.uint8 else _to_float
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video {path!r}")
    buf = []
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        buf.append(conv(bgr))
        if len(buf) == chunk:
            yield np.stack(buf)
            buf = []
    cap.release()
    if buf:
        yield np.stack(buf)


def write_video(
    path: str, frames: np.ndarray, fps: float = 30.0, codec: str = "mp4v"
) -> None:
    """Encode (T, H, W, 3) RGB float [-1, 1] frames to a video file."""
    _require_cv2()
    t, h, w, _ = frames.shape
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*codec), fps, (w, h)
    )
    if not writer.isOpened():
        raise RuntimeError(f"cannot open video writer for {path!r}")
    for f in frames:
        writer.write(_to_uint8_bgr(f))
    writer.release()


class VideoWriterStream:
    """Incremental encoder for streaming pipelines."""

    def __init__(self, path: str, fps: float, size_hw: Tuple[int, int],
                 codec: str = "mp4v"):
        _require_cv2()
        h, w = size_hw
        self._writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*codec), fps, (w, h)
        )
        if not self._writer.isOpened():
            raise RuntimeError(f"cannot open video writer for {path!r}")

    def write(self, frames: np.ndarray) -> None:
        for f in frames:
            self._writer.write(_to_uint8_bgr(f))

    def close(self) -> None:
        self._writer.release()


def _to_float(bgr: np.ndarray) -> np.ndarray:
    rgb = bgr[..., ::-1].astype(np.float32)
    return rgb / 127.5 - 1.0


def _to_uint8_rgb(bgr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(bgr[..., ::-1])


def _to_uint8_bgr(frame: np.ndarray) -> np.ndarray:
    if frame.dtype == np.uint8:  # already transport format: swap only
        return frame[..., ::-1]
    rgb = np.clip((frame + 1.0) * 127.5, 0, 255).astype(np.uint8)
    return rgb[..., ::-1]


class Prefetcher:
    """Background-thread prefetch over an iterator with a bounded queue
    (the host half of double buffering; SURVEY.md section 3.5)."""

    _DONE = object()

    def __init__(self, it: Iterator, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item
