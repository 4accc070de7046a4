"""Bilinear grid sampling with exact ``torch.nn.functional.grid_sample``
semantics, in NHWC layout.

This is the hottest op of the whole system (SURVEY.md C8 / section 3.4):
the reference's single ``F.grid_sample`` call site (ATen
``grid_sampler_2d`` CUDA kernel) is rebuilt here as

- a pure-XLA gather implementation (this file) used as the CPU oracle,
  autodiff path, and correctness baseline, and
- a fused Pallas gather-interpolate TPU kernel
  (``pwstablenet_tpu.kernels.grid_sample_pallas``) validated against it.

Semantics (locked by torch parity tests in ``tests/test_grid_sample.py``):

- ``grid`` holds normalized coordinates in ``[-1, 1]``; ``grid[..., 0]``
  is x (width), ``grid[..., 1]`` is y (height).
- ``align_corners=True``: ``-1``/``+1`` map to the *centers* of the
  corner pixels; ``False``: to the corner pixels' outer edges.
- ``padding_mode``: ``zeros`` (out-of-bounds taps contribute 0),
  ``border`` (coordinates clamp to the edge), ``reflection``
  (coordinates reflect off the borders, then clamp).

Layout note: the reference is NCHW (torch); this framework is NHWC
throughout, the TPU-native layout (channels on the 128-lane minor
dimension).  Parity tests transpose at the boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_PADDING_MODES = ("zeros", "border", "reflection")
_MODES = ("bilinear", "nearest")


def _unnormalize(coord: Array, size: int, align_corners: bool) -> Array:
    """Map normalized [-1, 1] coordinates to pixel coordinates."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(coord: Array, twice_low: float, twice_high: float) -> Array:
    """Reflect coordinates into [twice_low/2, twice_high/2] (torch
    ``reflect_coordinates``)."""
    if twice_low == twice_high:
        return jnp.zeros_like(coord)
    low = twice_low * 0.5
    span = (twice_high - twice_low) * 0.5
    coord = jnp.abs(coord - low)
    extra = jnp.mod(coord, span)
    flips = jnp.floor(coord / span)
    return jnp.where(jnp.mod(flips, 2.0) == 0.0, extra + low, span - extra + low)


def _compute_source_index(
    coord: Array, size: int, padding_mode: str, align_corners: bool
) -> Array:
    """Normalized coord -> (possibly clipped/reflected) pixel coord."""
    coord = _unnormalize(coord, size, align_corners)
    if padding_mode == "border":
        coord = jnp.clip(coord, 0.0, size - 1)
    elif padding_mode == "reflection":
        if align_corners:
            coord = _reflect(coord, 0.0, 2.0 * (size - 1))
        else:
            coord = _reflect(coord, -1.0, 2.0 * size - 1.0)
        coord = jnp.clip(coord, 0.0, size - 1)
    return coord


def _gather_2d(image: Array, iy: Array, ix: Array) -> Array:
    """Gather pixels: image (H, W, C), iy/ix (Ho, Wo) int32 -> (Ho, Wo, C).

    Indices must already be clipped in-bounds (masking is applied by the
    caller for zeros padding)."""
    h, w, c = image.shape
    flat = image.reshape(h * w, c)
    idx = iy * w + ix
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(*iy.shape, c)


def _grid_sample_single(
    image: Array,
    grid: Array,
    mode: str,
    padding_mode: str,
    align_corners: bool,
) -> Array:
    """Sample one image: (H, W, C), grid (Ho, Wo, 2) -> (Ho, Wo, C)."""
    h, w, _ = image.shape
    compute_dtype = jnp.promote_types(grid.dtype, jnp.float32)
    gx = grid[..., 0].astype(compute_dtype)
    gy = grid[..., 1].astype(compute_dtype)

    x = _compute_source_index(gx, w, padding_mode, align_corners)
    y = _compute_source_index(gy, h, padding_mode, align_corners)

    if mode == "nearest":
        # torch uses round-half-away-from-zero via nearbyint? It uses
        # std::nearbyint (round half to even).  jnp.round matches.
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ix = jnp.clip(ix, 0, w - 1)
        iy = jnp.clip(iy, 0, h - 1)
        out = _gather_2d(image, iy, ix)
        return jnp.where(valid[..., None], out, jnp.zeros_like(out))

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = (x - x0).astype(compute_dtype)
    wy1 = (y - y0).astype(compute_dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(yc: Array, xc: Array, wgt: Array) -> Array:
        iy = yc.astype(jnp.int32)
        ix = xc.astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        iyc = jnp.clip(iy, 0, h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        vals = _gather_2d(image, iyc, ixc).astype(compute_dtype)
        wgt = jnp.where(valid, wgt, 0.0)
        return vals * wgt[..., None]

    out = (
        corner(y0, x0, wy0 * wx0)
        + corner(y0, x1, wy0 * wx1)
        + corner(y1, x0, wy1 * wx0)
        + corner(y1, x1, wy1 * wx1)
    )
    return out.astype(image.dtype)


@functools.partial(
    jax.jit, static_argnames=("mode", "padding_mode", "align_corners")
)
def grid_sample(
    image: Array,
    grid: Array,
    mode: str = "bilinear",
    padding_mode: str = "border",
    align_corners: bool = True,
) -> Array:
    """Sample ``image`` at the locations given by ``grid``.

    Args:
      image: ``(B, H, W, C)`` array (any float dtype).
      grid: ``(B, Ho, Wo, 2)`` normalized sampling locations in
        ``[-1, 1]``; last axis is ``(x, y)``.
      mode: ``bilinear`` or ``nearest``.
      padding_mode: ``zeros`` | ``border`` | ``reflection``.
      align_corners: torch-compatible corner convention.

    Returns:
      ``(B, Ho, Wo, C)`` sampled output with ``image``'s dtype.
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    if padding_mode not in _PADDING_MODES:
        raise ValueError(
            f"padding_mode must be one of {_PADDING_MODES}, got {padding_mode!r}"
        )
    if image.ndim != 4 or grid.ndim != 4 or grid.shape[-1] != 2:
        raise ValueError(
            f"expected image (B,H,W,C) and grid (B,Ho,Wo,2); got "
            f"{image.shape} and {grid.shape}"
        )
    if jnp.issubdtype(jnp.result_type(image), jnp.integer):
        raise ValueError(
            "grid_sample is the float oracle (output casts would "
            "truncate integers) — normalize with ops.pixels.to_unit, or "
            "use ops.warp.warp_image which handles uint8 end to end"
        )
    fn = functools.partial(
        _grid_sample_single,
        mode=mode,
        padding_mode=padding_mode,
        align_corners=align_corners,
    )
    return jax.vmap(fn)(image, grid)
