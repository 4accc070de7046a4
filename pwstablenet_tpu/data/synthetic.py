"""Procedural DeepStab-like synthetic clips (SURVEY.md section 4.2).

No dataset download is possible in this environment, so integration
tests and the demo pipeline use procedurally generated video: a random
smooth texture observed by a "stable" camera and by a jittering
"unstable" camera (random small affine shake per frame).  This mirrors
the structure of DeepStab's synchronized stable/unstable pairs (C2)
closely enough to exercise every training and inference path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _texture(rng: np.random.Generator, h: int, w: int, c: int = 3) -> np.ndarray:
    """Smooth random texture in [-1, 1] with multi-scale detail."""
    img = np.zeros((h, w, c), np.float32)
    for scale in (4, 8, 16, 32):
        small = rng.standard_normal((scale, scale, c)).astype(np.float32)
        # bilinear upsample via np (small sizes; host-side only)
        ys = np.linspace(0, scale - 1, h)
        xs = np.linspace(0, scale - 1, w)
        y0 = np.floor(ys).astype(int).clip(0, scale - 2)
        x0 = np.floor(xs).astype(int).clip(0, scale - 2)
        fy = (ys - y0)[:, None, None]
        fx = (xs - x0)[None, :, None]
        up = (
            small[y0][:, x0] * (1 - fy) * (1 - fx)
            + small[y0][:, x0 + 1] * (1 - fy) * fx
            + small[y0 + 1][:, x0] * fy * (1 - fx)
            + small[y0 + 1][:, x0 + 1] * fy * fx
        )
        img += up / scale**0.5
    m = np.abs(img).max() or 1.0
    return (img / m).astype(np.float32)


def _sample_bilinear(img: np.ndarray, ys: np.ndarray, xs: np.ndarray) -> np.ndarray:
    h, w, _ = img.shape
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    fy = (ys - y0)[..., None]
    fx = (xs - x0)[..., None]
    y0c = y0.clip(0, h - 1); y1c = (y0 + 1).clip(0, h - 1)
    x0c = x0.clip(0, w - 1); x1c = (x0 + 1).clip(0, w - 1)
    return (
        img[y0c, x0c] * (1 - fy) * (1 - fx)
        + img[y0c, x1c] * (1 - fy) * fx
        + img[y1c, x0c] * fy * (1 - fx)
        + img[y1c, x1c] * fy * fx
    ).astype(np.float32)


def synthetic_pair_clip(
    num_frames: int,
    height: int,
    width: int,
    seed: int = 0,
    shake_px: float = 6.0,
    pan_px: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (stable, unstable) clips, each (T, H, W, 3) in [-1, 1].

    The stable camera pans smoothly over a large texture; the unstable
    camera follows the same path plus per-frame random translation +
    slight rotation (camera shake).
    """
    rng = np.random.default_rng(seed)
    margin = int(shake_px * 4 + pan_px * num_frames + 8)
    world = _texture(rng, height + 2 * margin, width + 2 * margin)

    gy, gx = np.meshgrid(
        np.arange(height, dtype=np.float32),
        np.arange(width, dtype=np.float32),
        indexing="ij",
    )
    cy, cx = height / 2, width / 2

    stable_frames, unstable_frames = [], []
    jitter = np.zeros(2, np.float32)
    for t in range(num_frames):
        ox = margin + pan_px * t
        oy = margin + 0.3 * pan_px * t
        stable_frames.append(
            _sample_bilinear(world, gy + oy, gx + ox)
        )
        # random-walk shake, mean-reverting, plus tiny rotation
        jitter = 0.7 * jitter + rng.standard_normal(2).astype(np.float32) * shake_px * 0.5
        theta = rng.standard_normal() * 0.004
        ry = (
            np.cos(theta) * (gy - cy) - np.sin(theta) * (gx - cx) + cy
        )
        rx = (
            np.sin(theta) * (gy - cy) + np.cos(theta) * (gx - cx) + cx
        )
        unstable_frames.append(
            _sample_bilinear(world, ry + oy + jitter[0], rx + ox + jitter[1])
        )
    return np.stack(stable_frames), np.stack(unstable_frames)


def _quantize(x: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8 transport format (matches real decoded
    video, which is natively 8-bit; see ops.pixels / data.video_io)."""
    return np.clip((x + 1.0) * 127.5, 0, 255).round().astype(np.uint8)


def make_train_batch(
    batch_size: int,
    height: int,
    width: int,
    temporal_window: int,
    seed: int = 0,
    dtype=np.uint8,
) -> dict:
    """Synthetic batch in the train-step format: two consecutive time
    steps per sample (SURVEY.md C13 temporal loss).

    Batches are uint8 by default — the device-transport format (the
    train step normalizes on device); pass ``dtype=np.float32`` for
    host-side floats in [-1, 1].
    """
    rng = np.random.default_rng(seed)
    half = temporal_window // 2
    stacks = np.zeros(
        (batch_size, 2, height, width, temporal_window * 3), np.float32
    )
    stable = np.zeros((batch_size, 2, height, width, 3), np.float32)
    for b in range(batch_size):
        t0 = half + 1
        frames = temporal_window + 2
        s, u = synthetic_pair_clip(
            frames, height, width, seed=int(rng.integers(1 << 31))
        )
        for k in range(2):  # two consecutive centers: t0, t0+1
            t = t0 + k
            window = u[t - half : t + half + 1]
            stacks[b, k] = window.transpose(1, 2, 0, 3).reshape(
                height, width, temporal_window * 3
            )
            stable[b, k] = s[t]
    if np.dtype(dtype) == np.uint8:
        return {"stacks": _quantize(stacks), "stable": _quantize(stable)}
    return {"stacks": stacks, "stable": stable}
