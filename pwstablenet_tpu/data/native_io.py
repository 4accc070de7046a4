"""ctypes bindings for the native C++ video runtime (SURVEY.md N-4).

``native/video_io.cpp`` keeps decode + color conversion in C++ with a
background decode thread and a bounded chunk queue, removing the
GIL-bound Python per-frame path at streaming rates.  Chunks are
**uint8 RGB** — the device-transport format (normalization to [-1, 1]
happens on-device; see ``ops.pixels``).  The library is built on
demand with ``make`` (g++ + system OpenCV 4) and rebuilt automatically
if an on-disk copy predates the uint8 ABI; all callers fall back to
the pure-Python ``video_io`` path when the toolchain or library is
unavailable, so the framework never hard depends on it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpwstable_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        for attempt in range(2):
            if not os.path.exists(_LIB_PATH):
                try:
                    subprocess.run(
                        ["make", "-C", _NATIVE_DIR],
                        check=True, capture_output=True, timeout=240,
                    )
                except Exception:
                    _build_failed = True
                    return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                lib.vd_next_u8  # uint8 ABI marker
                break
            except (OSError, AttributeError):
                if attempt == 0:  # stale pre-uint8 library: rebuild once
                    try:
                        os.remove(_LIB_PATH)
                    except OSError:
                        pass
                    continue
                _build_failed = True
                return None
        lib.vd_open.restype = ctypes.c_void_p
        lib.vd_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.vd_info.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.vd_next_u8.restype = ctypes.c_int
        lib.vd_next_u8.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.vd_close.argtypes = [ctypes.c_void_p]
        lib.ve_open.restype = ctypes.c_void_p
        lib.ve_open.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.ve_write_u8.restype = ctypes.c_int
        lib.ve_write_u8.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int
        ]
        lib.ve_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeDecoder:
    """Streaming decoder: chunks of (n, H, W, 3) uint8 RGB."""

    def __init__(self, path: str, chunk_frames: int = 8, queue_depth: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native video runtime unavailable")
        self._lib = lib
        self._h = lib.vd_open(
            path.encode(), int(chunk_frames), int(queue_depth)
        )
        if not self._h:
            raise FileNotFoundError(f"cannot open video {path!r}")
        self.chunk_frames = chunk_frames
        h = ctypes.c_int()
        w = ctypes.c_int()
        fps = ctypes.c_double()
        n = ctypes.c_int64()
        lib.vd_info(self._h, h, w, fps, n)
        self.height, self.width = h.value, w.value
        self.fps = fps.value or 30.0
        self.total_frames = n.value

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            buf = np.empty(
                (self.chunk_frames, self.height, self.width, 3), np.uint8
            )
            got = self._lib.vd_next_u8(
                self._h,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self.chunk_frames,
            )
            if got == 0:
                return
            yield buf[:got]

    def close(self) -> None:
        if self._h:
            self._lib.vd_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeEncoder:
    """Streaming encoder for uint8 RGB frames (float [-1, 1] accepted
    and converted host-side for compatibility)."""

    def __init__(self, path: str, fps: float, size_hw: Tuple[int, int],
                 codec: str = "mp4v"):
        lib = _load()
        if lib is None:
            raise RuntimeError("native video runtime unavailable")
        self._lib = lib
        h, w = size_hw
        self._h = lib.ve_open(
            path.encode(), codec.encode()[:4], float(fps), int(h), int(w)
        )
        if not self._h:
            raise RuntimeError(f"cannot open video writer for {path!r}")

    def write(self, frames: np.ndarray) -> None:
        if frames.dtype != np.uint8:
            frames = np.clip(
                (frames.astype(np.float32) + 1.0) * 127.5, 0, 255
            ).astype(np.uint8)
        frames = np.ascontiguousarray(frames)
        self._lib.ve_write_u8(
            self._h,
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            frames.shape[0],
        )

    def close(self) -> None:
        if self._h:
            self._lib.ve_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
