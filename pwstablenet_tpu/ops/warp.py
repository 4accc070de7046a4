"""Warp-field construction and application (SURVEY.md C7/C8, section 3.4).

Conventions
-----------
The generator's warp head emits a *displacement field* ("flow")
``(B, H, W, 2)`` in normalized grid units: the sampling grid is
``identity_grid + flow`` where the identity grid spans ``[-1, 1]`` in
both axes (``flow[..., 0]`` displaces x, ``flow[..., 1]`` displaces y).
A zero flow is the identity warp, which is why the head's final conv is
zero-initialized.

Because the generator runs at a fixed model resolution while frames can
be 480p/720p/1080p, flows are bilinearly resized to the frame resolution
before application — normalized units make the field
resolution-independent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pwstablenet_tpu.ops.grid_sample import grid_sample

Array = jax.Array


def identity_grid(
    height: int, width: int, dtype: jnp.dtype = jnp.float32
) -> Array:
    """Normalized identity sampling grid ``(H, W, 2)``, last axis (x, y).

    Uses the ``align_corners=True`` convention: -1 and +1 are the centers
    of the edge pixels (matches the reference's torch ``affine_grid``
    usage with align_corners=True; locked by parity tests)."""
    ys = jnp.linspace(-1.0, 1.0, height, dtype=dtype)
    xs = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([grid_x, grid_y], axis=-1)


def flow_to_grid(flow: Array) -> Array:
    """Displacement field ``(B, H, W, 2)`` -> absolute sampling grid."""
    _, h, w, _ = flow.shape
    return identity_grid(h, w, dtype=flow.dtype)[None] + flow


def resize_flow(flow: Array, height: int, width: int) -> Array:
    """Bilinearly resize a normalized flow field to (height, width).

    Normalized units mean no magnitude rescaling is needed — only
    spatial interpolation."""
    b, _, _, c = flow.shape
    return jax.image.resize(
        flow, (b, height, width, c), method="bilinear", antialias=False
    )


@functools.partial(
    jax.jit,
    static_argnames=("padding_mode", "align_corners", "use_pallas"),
)
def warp_image(
    image: Array,
    flow: Array,
    padding_mode: str = "border",
    align_corners: bool = True,
    use_pallas: bool = True,
) -> Array:
    """Warp ``image (B, H, W, C)`` by displacement ``flow (B, h, w, 2)``.

    The flow is resized to the image resolution if needed, converted to
    an absolute grid, and applied with the fused Pallas gather-interpolate
    kernel on TPU (XLA gather fallback elsewhere / under autodiff)."""
    from pwstablenet_tpu.ops.pixels import from_unit, to_unit

    b, h, w, _ = image.shape
    if flow.shape[1:3] != (h, w):
        flow = resize_flow(flow, h, w)
    grid = flow_to_grid(flow.astype(jnp.float32))
    is_int = jnp.issubdtype(image.dtype, jnp.integer)
    if use_pallas and _pallas_available():
        from pwstablenet_tpu.kernels.grid_sample_pallas import (
            grid_sample_pallas_padded,
            pallas_supported_padded,
        )

        if pallas_supported_padded(image.shape, image.dtype):
            if (
                is_int
                and image.shape[-1] == 3
                and padding_mode in ("border", "reflection")
            ):
                # packed uint8 fast path (3x fewer gathers): uint8 in,
                # uint8 out, exact up to quantized-output rounding
                return grid_sample_pallas_padded(
                    image.astype(jnp.uint8),
                    grid,
                    padding_mode=padding_mode,
                    align_corners=align_corners,
                )
            out = grid_sample_pallas_padded(
                to_unit(image),
                grid,
                padding_mode=padding_mode,
                align_corners=align_corners,
            )
            return from_unit(out) if is_int else out
    out = grid_sample(
        to_unit(image) if is_int else image,
        grid,
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=align_corners,
    )
    return from_unit(out) if is_int else out


@functools.cache
def _pallas_available() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------
# Fused differentiable warp (custom VJP; the training/cascade hot path)
# ---------------------------------------------------------------------
#
# XLA's gather makes grid_sample the single most expensive op of the
# whole system (measured: the cascade's inter-stage warp was 70% of the
# generator's forward on v5e).  ``warp_image_fused`` runs the Pallas
# kernel in BOTH directions via jax.custom_vjp:
#
#   forward : fused gather-interpolate kernel
#   backward: fused gradient kernel producing d/dflow (exact torch
#             gGrid semantics)
#
# The IMAGE cotangent is defined as zero: in every use inside this
# framework the warped image is input data (the unstable center frame),
# never a function of parameters.  The image input is wrapped in
# stop_gradient to make that contract explicit; use ``warp_image``
# (XLA autodiff path) if image gradients are ever needed.


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3)
)
def _fused_sample(image, grid, padding_mode, align_corners):
    from pwstablenet_tpu.kernels.grid_sample_pallas import (
        grid_sample_pallas_padded,
    )

    return grid_sample_pallas_padded(
        image, grid, padding_mode=padding_mode, align_corners=align_corners
    )


def _fused_sample_fwd(image, grid, padding_mode, align_corners):
    out = _fused_sample(image, grid, padding_mode, align_corners)
    return out, (image, grid)


def _fused_sample_bwd(padding_mode, align_corners, res, cot):
    from pwstablenet_tpu.kernels.grid_sample_pallas import (
        grid_sample_grad_pallas_padded,
    )

    image, grid = res
    dgrid = grid_sample_grad_pallas_padded(
        image,
        grid,
        cot.astype(jnp.float32),
        padding_mode=padding_mode,
        align_corners=align_corners,
    )
    return jnp.zeros_like(image), dgrid


_fused_sample.defvjp(_fused_sample_fwd, _fused_sample_bwd)


@functools.partial(
    jax.jit, static_argnames=("padding_mode", "align_corners")
)
def warp_image_fused(
    image: Array,
    flow: Array,
    padding_mode: str = "border",
    align_corners: bool = True,
) -> Array:
    """Differentiable fused warp: Pallas kernel forward AND backward
    (flow gradients only — image treated as data; see module comment).

    Falls back to the XLA path off-TPU or for unsupported geometry."""
    from pwstablenet_tpu.kernels.grid_sample_pallas import (
        pallas_supported_padded,
    )

    b, h, w, _ = image.shape
    if flow.shape[1:3] != (h, w):
        flow = resize_flow(flow, h, w)
    image = jax.lax.stop_gradient(image)
    if not (
        _pallas_available()
        and pallas_supported_padded(image.shape, image.dtype)
    ):
        grid = flow_to_grid(flow.astype(jnp.float32))
        return grid_sample(
            image, grid, mode="bilinear",
            padding_mode=padding_mode, align_corners=align_corners,
        )
    grid = flow_to_grid(flow.astype(jnp.float32))
    return _fused_sample(image, grid, padding_mode, align_corners)
