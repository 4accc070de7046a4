"""Ahead-of-time export of the inference step (serving story).

The reference ships a research test-script; a production deployment
wants the compiled program as a self-contained artifact.  This module
serializes the pipeline's chunk step to StableHLO via ``jax.export``:
the artifact pins the exact program (model topology, fused warp path,
uint8 transport semantics) and reloads without the framework's model
code — only JAX is needed at serving time.

Parameters stay ARGUMENTS (not baked constants): the artifact pairs
with an Orbax checkpoint (``train.checkpoint``), so one exported
program serves any compatible weights and the blob stays small.

Round-trip locked by ``tests/test_export.py``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax import export as jax_export

from pwstablenet_tpu.pipeline import Stabilizer


def export_chunk_step(
    stab: Stabilizer,
    frame_hw: Tuple[int, int],
    batch_windows: Optional[int] = None,
    dtype=np.uint8,
) -> bytes:
    """Serialize the compiled chunk step for fixed frame geometry.

    The exported callable has signature ``(params, frames) ->
    (stabilized, warp_fields)`` with ``frames`` of shape
    ``(batch_windows + T - 1, H, W, 3)`` in ``dtype`` (uint8 transport
    by default, matching the decoder).
    """
    h, w = frame_hw
    n = batch_windows or stab.pipeline_cfg.batch_windows
    T = stab.model_cfg.temporal_window
    frames_spec = jax.ShapeDtypeStruct((n + T - 1, h, w, 3), dtype)
    params_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), stab.params
    )
    use_pallas = stab._pallas_ok(frames_spec.shape)

    def fn(params, frames):
        return stab._chunk_step(params, frames, use_pallas)

    exported = jax_export.export(jax.jit(fn))(params_spec, frames_spec)
    return exported.serialize()


def save_chunk_step(path: str, *args, **kwargs) -> str:
    with open(path, "wb") as f:
        f.write(export_chunk_step(*args, **kwargs))
    return path


class ExportedStabilizerStep:
    """A deserialized chunk step: ``step(params, frames)``."""

    def __init__(self, blob: bytes):
        self._exported = jax_export.deserialize(blob)

    @classmethod
    def load(cls, path: str) -> "ExportedStabilizerStep":
        with open(path, "rb") as f:
            return cls(f.read())

    @property
    def in_avals(self):
        return self._exported.in_avals

    def __call__(self, params, frames):
        return self._exported.call(params, frames)
