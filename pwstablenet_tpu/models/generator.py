"""Cascaded multi-stage generator (SURVEY.md C6, call stack 3.3).

Stage 1 maps the temporal frame stack to a coarse warp field; each later
stage refines it (coarse -> fine, with intermediate supervision on every
stage — SURVEY.md C15).  Stage k > 1 consumes, per the ``interstage``
config (the reference's exact wiring is encoded as a config choice, see
SURVEY.md section 7 M2 "hard part #2"):

- ``warped``:   the stack augmented with the previous stage's warped
                center frame and its flow field;
- ``features``: the previous stage's decoder feature pyramid via
                inter-stage skip connections;
- ``both``:     both of the above (default).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from flax import linen as nn

from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.models.unet import StageUNet
from pwstablenet_tpu.ops.warp import warp_image_fused


class CascadedGenerator(nn.Module):
    """Frame stack (B, H, W, T*C) -> per-stage warp fields [(B, H, W, 2)]."""

    cfg: ModelConfig

    def center_frame(self, stack: jnp.ndarray) -> jnp.ndarray:
        """Extract the current frame from the temporal stack (at
        ``cfg.center_index`` — symmetric by default, last for the
        causal low-latency mode)."""
        cfg = self.cfg
        c0 = cfg.center_index * cfg.in_channels
        return stack[..., c0 : c0 + cfg.in_channels]

    @nn.compact
    def __call__(
        self, stack: jnp.ndarray, *, deterministic: bool = True
    ) -> List[jnp.ndarray]:
        cfg = self.cfg
        flows: List[jnp.ndarray] = []
        x = stack
        feats = None
        for s in range(cfg.num_stages):
            extra = feats if (s > 0 and cfg.interstage in ("features", "both")) else None
            with jax.named_scope(f"cascade_stage{s}"):
                flow, feats = StageUNet(cfg, name=f"stage{s}")(
                    x, extra_skips=extra, deterministic=deterministic
                )
            if s > 0:
                flow = flows[-1] + flow  # residual refinement
            flows.append(flow)
            if s + 1 < cfg.num_stages and cfg.interstage in ("warped", "both"):
                center = self.center_frame(stack)
                warped = warp_image_fused(
                    center.astype(jnp.float32),
                    flow,
                    padding_mode=cfg.padding_mode,
                    align_corners=cfg.align_corners,
                )
                x = jnp.concatenate(
                    [stack, warped.astype(stack.dtype), flow.astype(stack.dtype)],
                    axis=-1,
                )
                # Stage boundary: without this barrier XLA fuses the
                # inter-stage warp gather into stage-2 consumers and
                # re-materializes it per use (measured 6x slowdown with
                # instance norm + feature skips on v5e).
                x = jax.lax.optimization_barrier(x)
            elif s + 1 < cfg.num_stages:
                x = stack
        return flows
