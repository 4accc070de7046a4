"""Streaming warp-field storage (SURVEY.md C19 "emit warp fields").

``stabilize_video`` emits one flow field per frame at model resolution.
Buffering them for the final ``np.savez`` is O(video length) host
memory — ~0.5 MB/frame float32 means ~54 GB for an hour at 30 fps,
regardless of video resolution.  ``WarpFieldWriter`` instead streams
chunks straight into a (deflate-free) ``.npz``: each chunk becomes an
``arr_NNNNN.npy`` zip member, so memory stays O(chunk).

``load_warp_fields`` reads both layouts: chunked files from this
writer and legacy single-key ``warp_fields`` archives.
"""

from __future__ import annotations

import io
import zipfile

import numpy as np


class WarpFieldWriter:
    """Incrementally write flow chunks to an ``.npz``-compatible file."""

    def __init__(self, path: str):
        self._zip = zipfile.ZipFile(path, "w", zipfile.ZIP_STORED)
        self._count = 0
        self.frames = 0

    def write(self, flows: np.ndarray) -> None:
        buf = io.BytesIO()
        np.lib.format.write_array(
            buf, np.ascontiguousarray(flows), allow_pickle=False
        )
        self._zip.writestr(f"arr_{self._count:05d}.npy", buf.getvalue())
        self._count += 1
        self.frames += flows.shape[0]

    def close(self) -> None:
        if self._zip is not None:
            self._zip.close()
            self._zip = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_warp_fields(path: str) -> np.ndarray:
    """Concatenate a warp-field archive (chunked or legacy layout)."""
    with np.load(path) as data:
        if "warp_fields" in data:
            return data["warp_fields"]
        keys = sorted(k for k in data.files if k.startswith("arr_"))
        if not keys:
            raise ValueError(f"{path!r} holds no warp fields")
        return np.concatenate([data[k] for k in keys])
