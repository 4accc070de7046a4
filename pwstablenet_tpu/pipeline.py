"""Public inference pipeline (SURVEY.md C19, call stack 3.2): unstable
clip in -> stabilized clip + warp fields out, mirroring the reference's
test-script entry point.

TPU-first design decisions:

- The generator always runs at its fixed ``model_resolution`` (static
  shapes, one compiled executable for any video size); warp fields are
  emitted in resolution-independent normalized units and applied to the
  full-resolution frames by the fused warp (Pallas kernel when the
  frame geometry supports it, XLA gather otherwise).
- Frames cross host->device ONCE per chunk; temporal window stacking
  happens on-device with static slices (a frame is reused by up to
  ``temporal_window`` windows, so host-side stacking would multiply
  H2D traffic by the window size).
- Chunks are processed in a streaming loop with background decode
  (``data.video_io.Prefetcher``) overlapping device compute.
"""

from __future__ import annotations

import dataclasses
import functools
import sys
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.models import CascadedGenerator
from pwstablenet_tpu.ops.pixels import from_unit, to_unit
from pwstablenet_tpu.ops.warp import resize_flow, warp_image

Array = jax.Array


class Stabilizer:
    """Video stabilization inference engine.

    ``params`` may come from training, an Orbax checkpoint
    (``train.checkpoint``), or a converted reference checkpoint
    (``interop.torch_import``).
    """

    def __init__(
        self,
        model_cfg: Optional[ModelConfig] = None,
        pipeline_cfg: Optional[PipelineConfig] = None,
        params=None,
        seed: int = 0,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` for clip-sharded
        inference — the chunk's temporal windows are sharded over the
        mesh's data axis (SURVEY.md section 5.7: the TPU-idiomatic
        scaling axis for video inference; devices need no exchange
        because windows are independent after halo stacking).
        ``batch_windows`` must be divisible by the mesh size."""
        self.model_cfg = model_cfg or ModelConfig()
        self.pipeline_cfg = pipeline_cfg or PipelineConfig()
        self.model = CascadedGenerator(self.model_cfg)
        self.mesh = mesh
        if mesh is not None and self.pipeline_cfg.batch_windows % mesh.size:
            raise ValueError(
                f"batch_windows ({self.pipeline_cfg.batch_windows}) must "
                f"be divisible by the mesh size ({mesh.size})"
            )
        if params is None:
            h, w = self.model_cfg.model_resolution
            x = jnp.zeros((1, h, w, self.model_cfg.stack_channels))
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), x)
        self.params = params

    # ------------------------------------------------------------------
    @functools.cached_property
    def _chunk_step(self):
        """Compiled per-chunk step: frames (N+T-1, H, W, 3) ->
        (stabilized (N, H, W, 3), flows (N, h, w, 2))."""
        cfg = self.model_cfg
        mh, mw = cfg.model_resolution
        T = cfg.temporal_window
        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))

        @functools.partial(jax.jit, static_argnames=("use_pallas",))
        def step(params, frames, use_pallas):
            # uint8 transport: frames arrive in the decoder's dtype and
            # are normalized here, on device (ops.pixels); output frames
            # return in the same dtype, so the link carries 1 byte/px
            # each way instead of 4.
            is_int = jnp.issubdtype(frames.dtype, jnp.integer)
            n = frames.shape[0] - (T - 1)
            with jax.named_scope("normalize"):
                framesf = to_unit(frames)
            with jax.named_scope("preprocess_resize"):
                small = jax.image.resize(
                    framesf,
                    (framesf.shape[0], mh, mw, framesf.shape[-1]),
                    method="bilinear",
                )
            # temporal stacking with static slices: window j contributes
            # frames [j, j+n)
            with jax.named_scope("temporal_stack"):
                stacks = jnp.concatenate(
                    [small[j : j + n] for j in range(T)], axis=-1
                )
            if mesh is not None:
                # clip-sharded inference: windows split over the mesh
                stacks = jax.lax.with_sharding_constraint(stacks, shard)
            flows = self.model.apply(params, stacks)
            flow = flows[-1]  # final cascade stage
            # warp the RAW center frames: for uint8 input, warp_image
            # takes the packed fast path and returns uint8 directly (no
            # f32 frame materialization, no requantize pass)
            centers = frames[cfg.center_index : cfg.center_index + n]
            with jax.named_scope("fused_warp"):
                stabilized = warp_image(
                    centers,
                    flow,
                    padding_mode=cfg.padding_mode,
                    align_corners=cfg.align_corners,
                    use_pallas=use_pallas,
                )
            if is_int and not jnp.issubdtype(
                stabilized.dtype, jnp.integer
            ):
                stabilized = from_unit(stabilized)
            flow = flow.astype(jnp.dtype(self.pipeline_cfg.warp_field_dtype))
            return stabilized, flow

        return step

    # ------------------------------------------------------------------
    def stabilize_frames(
        self, frames: np.ndarray, batch_windows: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Stabilize a clip.

        Args:
          frames: (time, H, W, 3) RGB — float32 in [-1, 1], or uint8
            0..255 (the preferred device-transport format: 4x fewer
            host->device bytes; normalization happens on device).
        Returns:
          (stabilized (time, H, W, 3) in the input dtype,
          warp_fields (time, h, w, 2) normalized displacements at model
          resolution).
        """
        outs, flows = [], []
        for s, f in self._stream(iter([frames]), batch_windows):
            outs.append(s)
            flows.append(f)
        return np.concatenate(outs), np.concatenate(flows)

    def stabilize_video(
        self,
        input_path: str,
        output_path: str,
        warp_field_path: Optional[str] = None,
        max_frames: int = -1,
    ) -> dict:
        """Video-in/video-out entry point (the reference's CLI surface).

        Streams arbitrarily long videos: decode (background thread) ->
        device chunks -> stabilized frames -> incremental encode.
        Optionally saves warp fields as a compressed ``.npz``.
        """
        cfg = self.pipeline_cfg
        chunk = max(cfg.batch_windows, 1)

        # Prefer the native C++ decode/encode runtime (its decode thread
        # + bounded queue replaces the Python prefetcher); fall back to
        # the pure-Python OpenCV path.
        from pwstablenet_tpu.data import native_io

        decoder = None
        if native_io.available():
            try:
                decoder = native_io.NativeDecoder(
                    input_path, chunk_frames=chunk,
                    queue_depth=cfg.prefetch_depth,
                )
            except FileNotFoundError:
                raise  # missing input is the caller's error, not a fallback
            except Exception as e:
                # a broken native build (ABI mismatch, partial .so) must
                # degrade LOUDLY to the Python path, not silently
                # (advisor finding, round 1)
                print(
                    "pwstablenet_tpu: native video decoder failed "
                    f"({type(e).__name__}: {e}); falling back to the "
                    "Python OpenCV path",
                    file=sys.stderr,
                )
                decoder = None
        if decoder is not None:
            fps, h, w = decoder.fps, decoder.height, decoder.width
            frames_iter = iter(decoder)
            if max_frames > 0:
                frames_iter = _limit_frames(frames_iter, max_frames)
            writer = native_io.NativeEncoder(
                output_path, fps, (h, w), cfg.output_codec
            )
        else:
            frames_iter = video_io.iter_video(
                input_path, chunk, dtype=np.uint8
            )
            if max_frames > 0:
                frames_iter = _limit_frames(frames_iter, max_frames)

            import cv2  # probe fps/size cheaply

            cap = cv2.VideoCapture(input_path)
            fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            cap.release()
            frames_iter = video_io.Prefetcher(frames_iter, cfg.prefetch_depth)
            writer = video_io.VideoWriterStream(
                output_path, fps, (h, w), cfg.output_codec
            )

        # warp fields stream to disk chunk by chunk (O(chunk) memory —
        # buffering an hour of flows would be tens of GB; see
        # data/warp_fields.py)
        flow_writer = None
        if cfg.emit_warp_fields and warp_field_path:
            from pwstablenet_tpu.data.warp_fields import WarpFieldWriter

            flow_writer = WarpFieldWriter(warp_field_path)
        count = 0
        try:
            for stabilized, flow in self._stream(
                frames_iter,
                cfg.batch_windows,
            ):
                stabilized = self._border_crop(stabilized)
                writer.write(stabilized)
                count += stabilized.shape[0]
                if flow_writer is not None:
                    flow_writer.write(flow)
        finally:
            writer.close()
            if flow_writer is not None:
                flow_writer.close()
        result = {"frames": count, "fps": fps, "output": output_path}
        if flow_writer is not None:
            result["warp_fields"] = warp_field_path
        return result

    # ------------------------------------------------------------------
    def _stream(
        self, chunks: Iterator[np.ndarray], batch_windows: Optional[int]
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Core streaming loop over decoded chunks.

        Maintains a halo of ``temporal_window - 1`` frames between
        chunks so every output frame sees its full temporal context;
        the clip edges are replicate-padded: ``center_index`` lead
        frames (past context) and ``future_frames`` tail frames
        (lookahead).  In the causal mode (``temporal_center == T-1``)
        the tail pad is ZERO — frame t's output never waits for (or
        depends on) frames after t, the live-streaming property.

        Device dispatch is ASYNC with a bounded in-flight queue: chunk
        i+k is dispatched while chunk i's results transfer back, so
        device compute, host decode and D2H overlap (this also hides
        per-dispatch link latency on remote-attached TPUs).
        """
        cfg = self.model_cfg
        T = cfg.temporal_window
        lead_pad = cfg.center_index
        tail_pad = cfg.future_frames
        n = batch_windows or self.pipeline_cfg.batch_windows
        depth = max(self.pipeline_cfg.prefetch_depth, 1) + 1

        inflight: list = []

        def drain(limit: int):
            while len(inflight) > limit:
                stab, flow, pad = inflight.pop(0)
                stab = np.asarray(stab)
                flow = np.asarray(flow)
                if pad:
                    stab, flow = stab[:-pad], flow[:-pad]
                yield stab, flow

        carry: Optional[np.ndarray] = None  # trailing T-1 frames
        first = True
        for chunk in chunks:
            if first:
                lead = np.repeat(chunk[:1], lead_pad, axis=0)
                chunk = np.concatenate([lead, chunk])
                first = False
            if carry is not None:
                chunk = np.concatenate([carry, chunk])
            # dispatch all complete windows, keep the tail as carry
            while chunk.shape[0] >= n + T - 1:
                inflight.append(self._dispatch_chunk(chunk[: n + T - 1]))
                yield from drain(depth)
                chunk = chunk[n:]
            carry = chunk
        if carry is not None:
            # flush: replicate-pad the end, then emit remaining windows
            tail = np.repeat(carry[-1:], tail_pad, axis=0)
            buf = np.concatenate([carry, tail])
            while buf.shape[0] >= T:
                m = buf.shape[0] - (T - 1)  # windows remaining
                take = min(n, m)
                inflight.append(
                    self._dispatch_chunk(
                        buf[: take + T - 1], allow_short=True
                    )
                )
                yield from drain(depth)
                buf = buf[take:]
        yield from drain(0)

    def _dispatch_chunk(self, frames: np.ndarray, allow_short: bool = False):
        """Async device dispatch; returns (stab_dev, flow_dev, pad)."""
        cfg = self.model_cfg
        T = cfg.temporal_window
        n_target = self.pipeline_cfg.batch_windows
        n = frames.shape[0] - (T - 1)
        if n < n_target and not allow_short:
            raise ValueError("internal: short chunk without allow_short")
        # pad short flush chunks to the compiled batch size (static shapes)
        pad = 0
        if n < n_target:
            pad = n_target - n
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], pad, axis=0)]
            )
        use_pallas = self._pallas_ok(frames.shape)
        stabilized, flow = self._chunk_step(
            self.params, jnp.asarray(frames), use_pallas
        )
        return stabilized, flow, pad

    def _pallas_ok(self, frames_shape) -> bool:
        return _pallas_ok(self.model_cfg, frames_shape)

    def _border_crop(self, frames: np.ndarray) -> np.ndarray:
        frac = self.pipeline_cfg.border_crop_frac
        if frac <= 0:
            return frames
        t, h, w, c = frames.shape
        dy, dx = int(h * frac), int(w * frac)
        return frames[:, dy : h - dy, dx : w - dx]


def _pallas_ok(model_cfg: ModelConfig, frames_shape) -> bool:
    """Whether the fused Pallas warp handles this batch geometry.

    Module-level (not a ``Stabilizer`` method) so pure warp replays like
    ``apply_warp_fields`` can ask without building a Stabilizer — whose
    construction jit-inits full generator params just to have some.
    """
    if jax.default_backend() != "tpu":
        return False
    from pwstablenet_tpu.kernels.grid_sample_pallas import (
        pallas_supported_padded,
    )

    t, h, w, c = frames_shape
    n = t - (model_cfg.temporal_window - 1)
    # all three torch padding modes dispatch to the fused kernel
    # (reflection via grid pre-reflection in the padded wrapper)
    return pallas_supported_padded((n, h, w, c), jnp.float32)


def _limit_frames(chunks: Iterator[np.ndarray], limit: int):
    seen = 0
    for c in chunks:
        if seen + c.shape[0] >= limit:
            yield c[: limit - seen]
            return
        seen += c.shape[0]
        yield c


def stabilize(
    frames: np.ndarray,
    model_cfg: Optional[ModelConfig] = None,
    params=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Functional one-shot API: clip in -> (stabilized clip, warp fields).

    Mirrors the reference inference entry point (BASELINE.json:5)."""
    return Stabilizer(model_cfg, params=params).stabilize_frames(frames)


def apply_warp_fields(
    frames: np.ndarray,
    flows: np.ndarray,
    model_cfg: Optional[ModelConfig] = None,
    batch_frames: int = 8,
) -> np.ndarray:
    """Re-apply exported warp fields to the original frames.

    The warp fields a stabilization run emits (``stabilize_video``'s
    ``warp_field_path`` .npz / ``stabilize_frames``'s second return) ARE
    the transformation, not a log: applying them to the original clip
    reproduces the stabilized output exactly (same fused warp, same
    padding/align semantics — one code path).  Use cases: re-rendering
    at a different crop, auditing a run, or applying a correction
    computed offline.

    Args:
      frames: (T, H, W, 3) original clip — uint8 or [-1, 1] float32.
      flows:  (T, h, w, 2) normalized displacement fields (any model
        resolution; bilinearly upsampled to the frame size on device),
        e.g. from ``data.warp_fields.load_warp_fields``.
      model_cfg: warp semantics source (padding mode, align corners).
      batch_frames: frames per device step (static shapes: the last
        chunk is pad-replicated to this size and trimmed).
    Returns:
      stabilized frames, (T, H, W, 3), in the input dtype.
    """
    if frames.shape[0] != flows.shape[0]:
        raise ValueError(
            f"frames ({frames.shape[0]}) and warp fields "
            f"({flows.shape[0]}) must cover the same time steps"
        )
    cfg = model_cfg or ModelConfig()
    n = max(int(batch_frames), 1)
    outs = []
    for i in range(0, frames.shape[0], n):
        f = frames[i : i + n]
        fl = flows[i : i + n]
        pad = n - f.shape[0]
        if pad:
            f = np.concatenate([f, np.repeat(f[-1:], pad, axis=0)])
            fl = np.concatenate([fl, np.repeat(fl[-1:], pad, axis=0)])
        use_pallas = _pallas_ok(
            cfg, (f.shape[0] + cfg.temporal_window - 1,) + f.shape[1:]
        )
        out = warp_image(
            jnp.asarray(f),
            jnp.asarray(fl).astype(jnp.float32),
            padding_mode=cfg.padding_mode,
            align_corners=cfg.align_corners,
            use_pallas=use_pallas,
        )
        out = np.asarray(out)
        outs.append(out[: n - pad] if pad else out)
    return np.concatenate(outs)
