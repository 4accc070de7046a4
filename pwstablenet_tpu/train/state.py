"""Training state: generator + discriminator params, two optimizers,
frozen feature-extractor params, PRNG, step counter (SURVEY.md C16-C18).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.models import (
    CascadedGenerator,
    FeatureExtractor,
    PatchDiscriminator,
)


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    feat_params: Any           # frozen (SURVEY.md C12)
    g_opt: Any
    d_opt: Any
    rng: jnp.ndarray
    # exponential moving average of g_params (None unless
    # TrainConfig.ema_decay > 0); the preferred inference weights
    g_ema: Any = None


def generator_params(state: "TrainState", prefer_ema: bool = True):
    """Generator weights for inference: the EMA copy when tracked
    (smoother outputs — standard GAN practice), else the raw params."""
    if prefer_ema and state.g_ema is not None:
        return state.g_ema
    return state.g_params


def make_lr_schedule(cfg: TrainConfig, base_lr: float):
    """Constant then linear decay to zero (pix2pix-style, C16)."""
    total = cfg.num_epochs * cfg.steps_per_epoch
    decay_start = int(total * cfg.lr_decay_start_frac)
    return optax.join_schedules(
        [
            optax.constant_schedule(base_lr),
            optax.linear_schedule(base_lr, 0.0, max(total - decay_start, 1)),
        ],
        [decay_start],
    )


def make_optimizers(cfg: TrainConfig):
    g_tx = optax.adam(
        make_lr_schedule(cfg, cfg.lr_g), b1=cfg.adam_b1, b2=cfg.adam_b2
    )
    d_tx = optax.adam(
        make_lr_schedule(cfg, cfg.lr_d), b1=cfg.adam_b1, b2=cfg.adam_b2
    )
    return g_tx, d_tx


def create_models(model_cfg: ModelConfig):
    return (
        CascadedGenerator(model_cfg),
        PatchDiscriminator(model_cfg),
        FeatureExtractor(model_cfg),
    )


def create_train_state(
    model_cfg: ModelConfig, train_cfg: TrainConfig, rng: jax.Array
) -> Tuple[TrainState, Tuple]:
    """Initialize params and optimizer states (jit the init — eager
    op-by-op init is pathologically slow through the TPU tunnel)."""
    gen, disc, feat = create_models(model_cfg)
    h, w = model_cfg.model_resolution
    stack = jnp.zeros((1, h, w, model_cfg.stack_channels), jnp.float32)
    pair = jnp.zeros((1, h, w, 2 * model_cfg.in_channels), jnp.float32)
    frame = jnp.zeros((1, h, w, model_cfg.in_channels), jnp.float32)

    rng, gr, dr, fr = jax.random.split(rng, 4)
    g_params = jax.jit(gen.init)(gr, stack)
    d_params = jax.jit(disc.init)(dr, pair)
    feat_params = jax.jit(feat.init)(fr, frame)

    g_tx, d_tx = make_optimizers(train_cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        feat_params=feat_params,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        rng=rng,
        # EMA starts at the init point (standard).  Must be a distinct
        # buffer copy, NOT an alias of g_params: the data-parallel step
        # donates the whole state, and XLA rejects donating the same
        # buffer twice.
        g_ema=(
            jax.tree_util.tree_map(jnp.copy, g_params)
            if train_cfg.ema_decay > 0
            else None
        ),
    )
    return state, (gen, disc, feat)
