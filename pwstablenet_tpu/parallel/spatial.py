"""Spatially-sharded warping: scale SINGLE-frame work across the mesh
(SURVEY.md section 2.3 — the build-side extension of the reference's
nonexistent model parallelism, designed TPU-first).

Clip-sharded inference (``pipeline.Stabilizer(mesh=...)``) scales
throughput over independent temporal windows; this module scales the
*per-frame* warp itself for very large frames (4K/8K stills or mural
video) by sharding the image rows over the mesh's data axis:

- each device holds a contiguous row band of the frame and of the flow;
- stabilization warps displace vertically by at most ``halo`` rows
  (same contract as the Pallas kernel's 3-block window, default 120),
  so each device only needs ``halo`` rows from each neighbor — two
  ``jax.lax.ppermute`` halo exchanges over ICI, no all-gather;
- the normalized grid is affinely remapped into each shard's extended
  local frame (exactly like the kernel's pad-to-lane remap) and the
  fused kernel (or the XLA oracle off-TPU) samples locally.

Padding modes: ``border`` and ``reflection`` (reflection is applied as
a global-coordinate pre-transform, after which border semantics are
exact).  ``zeros`` would need per-tap global validity inside the
kernel; callers use the unsharded path for it.

Correctness is locked by ``tests/test_parallel.py`` on the 8-device CPU
mesh: sharded output == unsharded oracle for smooth flows.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # stable alias (jax >= 0.4.35); experimental path as fallback
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from pwstablenet_tpu.ops.grid_sample import grid_sample

Array = jax.Array

_DEFAULT_HALO = 120  # rows; matches the Pallas kernel's BR contract


def _local_sample(img_ext, grid_local, padding_mode, align_corners):
    """Sample inside one shard: fused kernel on TPU, oracle elsewhere."""
    from pwstablenet_tpu.ops.warp import _pallas_available

    if _pallas_available():
        from pwstablenet_tpu.kernels.grid_sample_pallas import (
            grid_sample_pallas_padded,
            pallas_supported_padded,
        )

        if pallas_supported_padded(img_ext.shape, img_ext.dtype):
            return grid_sample_pallas_padded(
                img_ext, grid_local,
                padding_mode=padding_mode, align_corners=align_corners,
            )
    if jnp.issubdtype(img_ext.dtype, jnp.integer):
        # oracle path for uint8 shards: blend raw 0..255 in f32 and
        # round (plain astype would truncate); border semantics make
        # this exactly the packed kernel's arithmetic
        out = grid_sample(
            img_ext.astype(jnp.float32), grid_local,
            mode="bilinear", padding_mode=padding_mode,
            align_corners=align_corners,
        )
        return jnp.clip(jnp.round(out), 0.0, 255.0).astype(img_ext.dtype)
    return grid_sample(
        img_ext, grid_local,
        mode="bilinear", padding_mode=padding_mode,
        align_corners=align_corners,
    )


def spatial_sharded_warp(
    image: Array,
    flow: Array,
    mesh: Mesh,
    axis: Optional[str] = None,
    halo: int = _DEFAULT_HALO,
    padding_mode: str = "border",
    align_corners: bool = True,
) -> Array:
    """Warp ``image (B, H, W, C)`` by ``flow (B, H, W, 2)`` with rows
    sharded over ``mesh``'s ``axis``; returns the warped image with the
    same sharding.  Vertical displacement must stay within ``halo``
    rows (the stabilization contract); horizontal is unsharded.
    """
    axis = axis or mesh.axis_names[0]
    n = mesh.shape[axis]
    b, h, w, c = image.shape
    if h % n:
        raise ValueError(f"H={h} must divide over {n} mesh devices")
    if padding_mode not in ("border", "reflection"):
        raise ValueError(
            "spatial_sharded_warp supports border/reflection; use the "
            "unsharded path for zeros"
        )
    hs = h // n
    if halo > hs:
        raise ValueError(f"halo ({halo}) exceeds shard height ({hs})")

    if padding_mode == "reflection":
        # global-coordinate pre-reflection (exact; see the kernel's
        # _reflect_grid) — afterwards border semantics apply
        from pwstablenet_tpu.kernels.grid_sample_pallas import _reflect_grid

        from pwstablenet_tpu.ops.warp import flow_to_grid

        grid = flow_to_grid(flow.astype(jnp.float32))
        grid, _ = _reflect_grid(grid, h, w, align_corners)
    else:
        from pwstablenet_tpu.ops.warp import flow_to_grid

        grid = flow_to_grid(flow.astype(jnp.float32))

    spec = P(None, axis, None, None)

    fwd = [(i, i + 1) for i in range(n - 1)]   # send down: i -> i+1
    bwd = [(i + 1, i) for i in range(n - 1)]   # send up:   i+1 -> i

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
    )
    def warp_shard(img_blk, grid_blk):
        # img_blk: (B, hs, W, C) — this device's row band
        k = jax.lax.axis_index(axis)
        # halo exchange over ICI: my bottom rows -> next device's top
        # halo; my top rows -> previous device's bottom halo.  Edge
        # devices receive zeros, which are never sampled: border
        # clamping keeps global y in [0, H-1].
        from_above = jax.lax.ppermute(
            img_blk[:, hs - halo :], axis, perm=fwd
        )
        from_below = jax.lax.ppermute(img_blk[:, :halo], axis, perm=bwd)
        ext = jnp.concatenate([from_above, img_blk, from_below], axis=1)
        h_ext = hs + 2 * halo

        # global normalized grid -> extended-local normalized grid
        gx = grid_blk[..., 0]
        gy = grid_blk[..., 1]
        if align_corners:
            y_px = (gy + 1.0) * 0.5 * (h - 1)
        else:
            y_px = ((gy + 1.0) * h - 1.0) * 0.5
        # global border clamp (the ONLY clamp that may touch frame
        # edges; shard-local clamping would corrupt interior seams)
        y_px = jnp.clip(y_px, 0.0, h - 1)
        y_loc = y_px - (k * hs - halo).astype(y_px.dtype)
        if align_corners:
            gy_loc = y_loc / (0.5 * (h_ext - 1)) - 1.0
            gx_loc = gx
        else:
            gy_loc = (2.0 * y_loc + 1.0) / h_ext - 1.0
            gx_loc = gx
        grid_loc = jnp.stack([gx_loc, gy_loc], axis=-1)
        return _local_sample(
            ext, grid_loc, "border", align_corners
        ).astype(img_blk.dtype)

    sharding = NamedSharding(mesh, spec)
    image = jax.device_put(image, sharding)
    grid = jax.device_put(grid, sharding)
    return warp_shard(image, grid)
