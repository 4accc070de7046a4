"""Device-side pixel-range conversion (SURVEY.md section 3.5).

Frames travel host<->device as uint8 (the decoder's native dtype; 4x
fewer link bytes than float32 — see ``data.video_io``) and are
normalized to [-1, 1] in the jitted program, where the conversion fuses
into the surrounding compute for free.  Float inputs pass through
unchanged, so every entry point accepts either transport format.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def to_unit(x: Array, dtype=jnp.float32) -> Array:
    """uint8 0..255 -> [-1, 1]; floating inputs pass through (cast)."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x.astype(dtype) / jnp.asarray(127.5, dtype) - 1.0
    return x.astype(dtype)


def from_unit(x: Array) -> Array:
    """[-1, 1] float -> uint8 0..255 (rounded, saturating)."""
    y = jnp.round((x.astype(jnp.float32) + 1.0) * 127.5)
    return jnp.clip(y, 0.0, 255.0).astype(jnp.uint8)
