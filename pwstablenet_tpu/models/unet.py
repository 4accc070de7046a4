"""Stage UNet: one encoder-decoder stage of the cascaded generator
(SURVEY.md C5/C7, call stack section 3.3).

Pix2Pix-style topology: ``num_levels`` stride-2 downs (256x256 -> 1x1
at 8 levels), mirrored transpose-conv ups with intra-stage skip
concatenation, and a 2-channel warp head whose final conv is
zero-initialized so the stage starts as the identity warp.

Inter-stage wiring (SURVEY.md C6 "hard part #2"): the stage returns its
decoder feature pyramid; a later cascade stage consumes it through
``extra_skips`` — each incoming feature map is concatenated into the
decoder input of matching resolution.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.models.blocks import DownBlock, UpBlock, make_deconv_2x


class StageUNet(nn.Module):
    """One cascade stage: frame stack (+ optional context) -> warp field."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        extra_skips: Optional[Sequence[jnp.ndarray]] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """Returns (flow, decoder_features).

        flow: (B, H, W, 2) float32 displacement in normalized grid
        units.  decoder_features: per-level decoder outputs ordered
        coarse -> fine (excluding the head), for inter-stage skips.
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        x = x.astype(dtype)

        feats = [
            min(cfg.base_features * (2**i), cfg.max_features)
            for i in range(cfg.num_levels)
        ]

        # --- encoder ---
        skips: List[jnp.ndarray] = []
        for i, f in enumerate(feats):
            x = DownBlock(
                features=f,
                norm=cfg.norm,
                leaky_slope=cfg.leaky_slope,
                # pix2pix: no norm on the outermost and innermost level
                use_norm=0 < i < cfg.num_levels - 1,
                dtype=dtype,
                name=f"down{i}",
            )(x)
            skips.append(x)

        # --- decoder ---
        decoder_feats: List[jnp.ndarray] = []
        for j in range(cfg.num_levels - 1, 0, -1):
            level = cfg.num_levels - 1 - j  # 0 = coarsest up-step
            inputs = [x]
            if level > 0:
                inputs.append(skips[j])  # intra-stage skip
            # inter-stage skip: previous stage's decoder output at the
            # SAME resolution as this level's input (its level-1 output)
            if extra_skips is not None and 0 < level <= len(extra_skips):
                inputs.append(extra_skips[level - 1].astype(dtype))
            x = jnp.concatenate(inputs, axis=-1) if len(inputs) > 1 else x
            x = UpBlock(
                features=feats[j - 1],
                norm=cfg.norm,
                dropout_rate=(
                    cfg.dropout_rate
                    if cfg.use_dropout and level < 3
                    else 0.0
                ),
                dtype=dtype,
                impl=cfg.decoder_impl,
                name=f"up{level}",
            )(x, deterministic=deterministic)
            decoder_feats.append(x)

        # --- head: back to full resolution, 2-channel displacement ---
        inputs = [x, skips[0]]
        if extra_skips is not None and cfg.num_levels - 1 <= len(extra_skips):
            inputs.append(extra_skips[cfg.num_levels - 2].astype(dtype))
        x = jnp.concatenate(inputs, axis=-1)
        x = make_deconv_2x(
            cfg.base_features, dtype, "head_up", cfg.decoder_impl
        )(x)
        x = nn.relu(x)
        if extra_skips is not None and len(extra_skips) >= cfg.num_levels:
            # previous stage's full-resolution feature map
            x = jnp.concatenate(
                [x, extra_skips[cfg.num_levels - 1].astype(dtype)], axis=-1
            )
        decoder_feats.append(x)
        # Zero-init so training starts from the identity warp; computed
        # in float32 — the warp field is the precision-critical output.
        flow = nn.Conv(
            2,
            kernel_size=(3, 3),
            padding="SAME",
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            name="head",
        )(x.astype(jnp.float32))
        flow = flow * cfg.flow_scale
        return flow, decoder_feats
