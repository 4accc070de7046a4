"""Fused Pallas TPU gather-interpolate kernel for bilinear warping.

This is the TPU-native rebuild of the reference's hottest native op, the
ATen ``grid_sampler_2d`` CUDA kernel behind its single ``F.grid_sample``
call site (SURVEY.md C8 / N-2 / section 3.4).

Design notes (and an honest performance account)
------------------------------------------------
A CUDA grid-sample kernel is one thread per output pixel doing four
arbitrary global loads.  TPUs have no per-lane arbitrary load: Mosaic's
``tpu.dynamic_gather`` gathers within a *single* (8, 128) vreg along one
dimension (verified on v5e: multi-vreg gather dimensions raise
"Not implemented").  A general gather must therefore be emulated by
chunked vreg gathers + selects, which is why XLA's own highly tuned
gather lowering (measured at ~780 GB/s ≈ 95% of v5e HBM speed-of-light
on 720p warps) remains the default execution path for large frames
(``ops.grid_sample``).

What the Pallas kernel exploits is the locality of the warps this
framework actually produces — stabilization fields are smooth (they are
bilinearly upsampled from the generator's model-resolution output) and
bounded:

- output processed in 8-row x 128-lane tiles;
- per tile, source rows come from a ``row_window``-tall window whose
  base is the tile's own minimum source row (dynamic VMEM slice), so
  the vertical gather is a short select-accumulate sweep instead of H;
- the horizontal gather is a per-sublane ``dynamic_gather`` over the
  (static) 3-chunk column window around the tile;
- coordinate unnormalization, corner weights, the four taps and the
  bilinear blend all fuse in VMEM; the sampling grid is read once.

Layout: internally the kernel uses planar (C, H, W) buffers so W sits
on the 128-lane minor dimension — an interleaved NHWC block would pad
C=3 up to 128 lanes and inflate VMEM ~40x (observed).  The public
wrapper transposes from/to the framework's NHWC convention.

Exactness contract: the kernel equals ``ops.grid_sample`` whenever,
within any 8x128 output tile, (a) the spread of source rows fits the
row window minus alignment slack (``max(y0)-min(y0) <= row_window - 9``)
and (b) horizontal displacement stays within ``+-128`` px (always true
for images <= 384 px wide, where the column window spans the whole
row).  Warps
produced by this framework satisfy both by construction; arbitrary
adversarial grids may not, which is one more reason the general entry
point dispatches such cases to the XLA path.  Parity is validated in
``tests/test_pallas_kernel.py`` (interpret mode, small shapes) and on
real TPU by ``bench.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# 8 f32 sublanes per vreg: process 8 output rows per tile step.
_TILE_ROWS = 8
_LANES = 128
# Static column window: each 128-lane output chunk samples from itself
# plus _COL_SPAN chunks on either side.
_COL_SPAN = 1
_WIN_W = (2 * _COL_SPAN + 1) * _LANES

# v5e has 128 MB of VMEM; leave room for double-buffered blocks and
# compiler temporaries.
_VMEM_BUDGET_BYTES = 48 * 1024 * 1024


def pallas_supported(image_shape, image_dtype) -> bool:
    """Whether the fused kernel's layout constraints hold for this case.

    Requires H % 8 == 0, W % 128 == 0, and planar image + f32 grid +
    output to fit the VMEM budget (the kernel keeps one batch element
    fully resident).  Callers dispatch to the XLA path otherwise.
    """
    _, h, w, c = image_shape
    itemsize = jnp.dtype(image_dtype).itemsize
    vmem = h * w * (2 * c * itemsize + 2 * 4)  # image + out + grid
    return h % _TILE_ROWS == 0 and w % _LANES == 0 and vmem <= _VMEM_BUDGET_BYTES


def _sample_kernel(
    image_ref,  # (1, C, H, W)  VMEM, planar
    grid_ref,   # (1, 2, H, W)  VMEM, planar ([0]=x, [1]=y)
    out_ref,    # (1, C, H, W)  VMEM, planar
    *,
    height: int,
    width: int,
    channels: int,
    row_window: int,
    padding_mode: str,
    align_corners: bool,
):
    h, w = height, width
    num_tiles = h // _TILE_ROWS
    num_chunks = w // _LANES

    def tile_body(t, _):
        r0 = t * _TILE_ROWS

        for ock in range(num_chunks):
            c0 = ock * _LANES
            gx = grid_ref[0, 0, pl.ds(r0, _TILE_ROWS), c0 : c0 + _LANES]
            gy = grid_ref[0, 1, pl.ds(r0, _TILE_ROWS), c0 : c0 + _LANES]

            # --- unnormalize to pixel coordinates (torch semantics) ---
            if align_corners:
                x = (gx + 1.0) * 0.5 * (w - 1)
                y = (gy + 1.0) * 0.5 * (h - 1)
            else:
                x = ((gx + 1.0) * w - 1.0) * 0.5
                y = ((gy + 1.0) * h - 1.0) * 0.5

            if padding_mode == "border":
                x = jnp.clip(x, 0.0, w - 1)
                y = jnp.clip(y, 0.0, h - 1)

            x0f = jnp.floor(x)
            y0f = jnp.floor(y)
            fx = x - x0f
            fy = y - y0f
            x0 = x0f.astype(jnp.int32)
            y0 = y0f.astype(jnp.int32)

            w00 = (1.0 - fy) * (1.0 - fx)
            w01 = (1.0 - fy) * fx
            w10 = fy * (1.0 - fx)
            w11 = fy * fx
            if padding_mode == "zeros":
                vx0 = (x0 >= 0) & (x0 < w)
                vx1 = (x0 + 1 >= 0) & (x0 + 1 < w)
                vy0 = (y0 >= 0) & (y0 < h)
                vy1 = (y0 + 1 >= 0) & (y0 + 1 < h)
                w00 = jnp.where(vy0 & vx0, w00, 0.0)
                w01 = jnp.where(vy0 & vx1, w01, 0.0)
                w10 = jnp.where(vy1 & vx0, w10, 0.0)
                w11 = jnp.where(vy1 & vx1, w11, 0.0)

            # --- dynamic row-window base from this chunk's min source row
            # (clip y0 first: zeros mode leaves it unbounded).  The base
            # is rounded down to a sublane-aligned offset — Mosaic only
            # supports aligned dynamic loads — costing up to 7 rows of
            # window, hence the "spread <= row_window - 9" contract.
            y0c = jnp.clip(y0, 0, h - 1)
            yb = jnp.clip(jnp.min(y0c), 0, max(h - row_window, 0))
            yb = pl.multiple_of((yb // _TILE_ROWS) * _TILE_ROWS, _TILE_ROWS)
            # Lower bound -1, not 0: for y0 == -1 (zeros mode) the y0
            # taps are dead (weight 0) but the y1 taps must still hit
            # window row ly0 + 1 == 0.
            ly0 = jnp.clip(y0 - yb, -1, row_window - 1)

            # --- static column window: this chunk +- _COL_SPAN chunks --
            cb = min(max(c0 - _COL_SPAN * _LANES, 0), max(w - _WIN_W, 0))
            nseg = min(_WIN_W, w) // _LANES
            lx0 = jnp.clip(x0 - cb, 0, nseg * _LANES - 1)
            lx1 = jnp.clip(x0 + 1 - cb, 0, nseg * _LANES - 1)

            for c in range(channels):
                # Select-accumulate sweep over the window rows in
                # sublane-aligned groups of 8 (Mosaic requires aligned
                # dynamic loads; a fori_loop keeps the live set bounded
                # — a full python unroll blows scoped VMEM).  Within a
                # group rows are extracted with static slices.
                def group_step(wg, accs, c=c, ly0=ly0, lx0=lx0, lx1=lx1,
                               yb=yb, cb=cb, nseg=nseg):
                    a00, a01, a10, a11 = accs
                    gb = pl.multiple_of(
                        yb + wg * _TILE_ROWS, _TILE_ROWS
                    )
                    grps = [
                        image_ref[
                            0, c, pl.ds(gb, _TILE_ROWS),
                            cb + sk * _LANES : cb + (sk + 1) * _LANES,
                        ].astype(jnp.float32)
                        for sk in range(nseg)
                    ]
                    for rr in range(_TILE_ROWS):
                        r = wg * _TILE_ROWS + rr
                        # Broadcast window row r to all 8 sublanes,
                        # gather per-pixel columns segment by segment.
                        h0 = jnp.zeros((_TILE_ROWS, _LANES), jnp.float32)
                        h1 = jnp.zeros((_TILE_ROWS, _LANES), jnp.float32)
                        for sk in range(nseg):
                            base = sk * _LANES
                            seg = jax.lax.broadcast_in_dim(
                                grps[sk][rr : rr + 1, :],
                                (_TILE_ROWS, _LANES),
                                (0, 1),
                            )
                            i0 = jnp.clip(lx0 - base, 0, _LANES - 1)
                            i1 = jnp.clip(lx1 - base, 0, _LANES - 1)
                            g0 = jnp.take_along_axis(seg, i0, axis=1)
                            g1 = jnp.take_along_axis(seg, i1, axis=1)
                            in0 = (lx0 >= base) & (lx0 < base + _LANES)
                            in1 = (lx1 >= base) & (lx1 < base + _LANES)
                            h0 = jnp.where(in0, g0, h0)
                            h1 = jnp.where(in1, g1, h1)
                        # tap rows: y0 hits window row r, y0+1 hits r-1
                        sel0 = ly0 == r
                        sel1 = ly0 == r - 1
                        a00 = jnp.where(sel0, h0, a00)
                        a01 = jnp.where(sel0, h1, a01)
                        a10 = jnp.where(sel1, h0, a10)
                        a11 = jnp.where(sel1, h1, a11)
                    return (a00, a01, a10, a11)

                zeros = jnp.zeros((_TILE_ROWS, _LANES), jnp.float32)
                a00, a01, a10, a11 = jax.lax.fori_loop(
                    0,
                    row_window // _TILE_ROWS,
                    group_step,
                    (zeros, zeros, zeros, zeros),
                )

                out = w00 * a00 + w01 * a01 + w10 * a10 + w11 * a11
                out_ref[0, c, pl.ds(r0, _TILE_ROWS), c0 : c0 + _LANES] = (
                    out.astype(out_ref.dtype)
                )
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("padding_mode", "align_corners", "row_window", "interpret"),
)
def grid_sample_pallas(
    image: Array,
    grid: Array,
    padding_mode: str = "border",
    align_corners: bool = True,
    row_window: int = 32,
    interpret: bool = False,
) -> Array:
    """Bilinear grid sample via the fused Pallas kernel.

    Args/semantics match ``ops.grid_sample`` (bilinear only); image and
    grid are NHWC like the rest of the framework.  See the module
    docstring for the locality contract and dispatch policy.
    """
    b, h, w, c = image.shape
    if grid.shape != (b, h, w, 2):
        raise ValueError(
            "pallas kernel requires grid at image resolution; got "
            f"image {image.shape}, grid {grid.shape}"
        )
    if padding_mode not in ("border", "zeros"):
        raise ValueError("pallas kernel supports border/zeros padding")
    if h % _TILE_ROWS or w % _LANES:
        raise ValueError(
            f"pallas kernel requires H%{_TILE_ROWS}==0 and W%{_LANES}==0; "
            f"got ({h}, {w}) — use ops.grid_sample (see pallas_supported)"
        )

    kernel = functools.partial(
        _sample_kernel,
        height=h,
        width=w,
        channels=c,
        row_window=row_window,
        padding_mode=padding_mode,
        align_corners=align_corners,
    )
    # Planar layout inside the kernel: W on the 128-lane minor dim.
    image_p = jnp.moveaxis(image, -1, 1)
    grid_p = jnp.moveaxis(grid.astype(jnp.float32), -1, 1)
    out_p = pl.pallas_call(
        kernel,
        grid=(b,),
        compiler_params=pltpu.CompilerParams(
            # default scoped limit is 16 MB; v5e has 128 MB of VMEM and
            # one resident 720p frame + grid + output needs ~30 MB
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec(
                (1, c, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 2, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), image.dtype),
        interpret=interpret,
    )(image_p, grid_p)
    return jnp.moveaxis(out_p, 1, -1)
