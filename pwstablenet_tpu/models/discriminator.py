"""PatchGAN discriminator (SURVEY.md C9).

70x70-receptive-field conv stack classifying real/fake patches,
conditioned on the input (the warped/stable frame is concatenated with
the unstable center frame on channels, pix2pix-style).  Output is an
unnormalized per-patch score map; the GAN loss averages over patches.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.models.blocks import make_norm


class PatchDiscriminator(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        # The final stride-1 4x4 pad-1 convs each shrink the map by 1;
        # too many stride-2 layers for the input resolution leaves an
        # EMPTY score map whose mean is NaN — silent training poison
        # (found driving the CLI at 16x16 with the default 3-layer
        # disc), so fail loudly at trace time instead.
        s = min(x.shape[1], x.shape[2])
        for _ in range(cfg.disc_num_layers):
            s = (s - 2) // 2 + 1
        if s - 2 < 1:
            raise ValueError(
                f"disc_num_layers={cfg.disc_num_layers} is too deep for "
                f"{x.shape[1]}x{x.shape[2]} inputs: the PatchGAN score "
                "map would be empty (NaN loss). Reduce disc_num_layers "
                "(CLI: --disc-layers) or raise the resolution."
            )
        dtype = jnp.dtype(cfg.compute_dtype)
        x = x.astype(dtype)
        f = cfg.disc_base_features
        for i in range(cfg.disc_num_layers + 1):
            stride = 2 if i < cfg.disc_num_layers else 1
            x = nn.Conv(
                min(f * (2**i), 512),
                kernel_size=(4, 4),
                strides=(stride, stride),
                padding=((1, 1), (1, 1)),
                dtype=dtype,
                name=f"conv{i}",
            )(x)
            if i > 0:
                x = make_norm(cfg.disc_norm, dtype, name=f"norm{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        # per-patch score map, float32 for the loss
        return nn.Conv(
            1,
            kernel_size=(4, 4),
            strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dtype=jnp.float32,
            name="score",
        )(x.astype(jnp.float32))
