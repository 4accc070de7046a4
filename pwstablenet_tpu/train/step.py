"""The jit-compiled adversarial train step (SURVEY.md C17, call stack
3.1): one fused device program doing the D update then the G update —
the reference's per-batch ``d_loss.backward(); optD.step();
g_loss.backward(); optG.step()`` sequence becomes a single XLA module.

Batch format (built by ``data``):
  stacks: (B, 2, H, W, T*C) — temporal stacks for two consecutive time
          steps (for the temporal loss, C13)
  stable: (B, 2, H, W, C) — ground-truth stable frames

Batches arrive either as **uint8** (the preferred transport format —
4x fewer host->device bytes; normalized to [-1, 1] on device, see
``ops.pixels``) or as float32 already in [-1, 1].  The pair axis is
folded into the batch for all network forwards and unfolded only for
the temporal term.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.ops.pixels import to_unit
from pwstablenet_tpu.ops.warp import warp_image_fused
from pwstablenet_tpu.train import losses
from pwstablenet_tpu.train.state import TrainState, make_optimizers

Array = jax.Array


def _fold(x: Array) -> Array:
    """(B, 2, ...) -> (2B, ...)"""
    return x.reshape((-1,) + x.shape[2:])


def _center(stack: Array, cfg: ModelConfig) -> Array:
    c0 = cfg.center_index * cfg.in_channels
    return stack[..., c0 : c0 + cfg.in_channels]


def _temporal_term(train_cfg: TrainConfig, w_s: Array, stable: Array) -> Array:
    """C13 temporal loss over the folded (2B, ...) tensors, in the
    configured form (TrainConfig.temporal_mode)."""
    pair = w_s.reshape((-1, 2) + w_s.shape[1:])
    if train_cfg.temporal_mode == "compensated":
        gt_pair = stable.reshape((-1, 2) + stable.shape[1:])
        return losses.temporal_loss_compensated(pair, gt_pair)
    return losses.temporal_loss(pair)


def make_train_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    gen,
    disc,
    feat,
):
    """Build the pure train_step; callers jit it (optionally with
    shardings — see ``parallel.data_parallel_step``)."""
    if train_cfg.temporal_mode not in ("raw", "compensated"):
        raise ValueError(
            f"unknown temporal_mode {train_cfg.temporal_mode!r} "
            "(raw | compensated)"
        )
    if train_cfg.pixel_loss_mode not in ("l1", "mean_matched", "gradient"):
        raise ValueError(
            f"unknown pixel_loss_mode {train_cfg.pixel_loss_mode!r} "
            "(l1 | mean_matched | gradient)"
        )
    g_tx, d_tx = make_optimizers(train_cfg)

    def warp_stages(flows, center):
        # fused Pallas forward+backward (flow gradients; frames are data)
        return [
            warp_image_fused(
                center,
                f,
                padding_mode=model_cfg.padding_mode,
                align_corners=model_cfg.align_corners,
            )
            for f in flows
        ]

    if train_cfg.grad_accum_steps > 1:
        return _make_accum_train_step(
            model_cfg, train_cfg, gen, disc, feat, g_tx, d_tx, warp_stages
        )

    def train_step(
        state: TrainState, batch: Dict[str, Array]
    ) -> Tuple[TrainState, Dict[str, Array]]:
        stacks = to_unit(_fold(batch["stacks"]))  # (2B, H, W, T*C)
        stable = to_unit(_fold(batch["stable"]))  # (2B, H, W, C)
        center = _center(stacks, model_cfg)      # (2B, H, W, C) unstable
        rng, drop_rng = jax.random.split(state.rng)

        def g_apply(params, x):
            kwargs = {}
            if model_cfg.use_dropout:
                kwargs = {
                    "deterministic": False,
                    "rngs": {"dropout": drop_rng},
                }
            return gen.apply(params, x, **kwargs)

        # ---------------- shared generator forward -----------------
        # The D step needs G's (detached) outputs and the G step needs
        # the same outputs under autodiff — the flows are identical
        # values either way (G's params don't change in between), so
        # the forward runs ONCE through jax.vjp: its primal feeds the D
        # update detached, and its pullback turns dL/dflows from the G
        # loss (computed against the UPDATED discriminator) into
        # parameter gradients.  Mathematically identical to the
        # reference's recompute-twice alternating scheme, one full G
        # forward cheaper per step.
        flows, g_pullback = jax.vjp(
            lambda p: g_apply(p, stacks), state.g_params
        )

        # ---------------- D update (fake detached) ----------------
        flows_detached = jax.lax.stop_gradient(flows)
        fake_frames = jax.lax.stop_gradient(
            warp_stages(flows_detached, center)[-1]
        )

        def d_loss_fn(d_params):
            real_logits = disc.apply(
                d_params, jnp.concatenate([center, stable], axis=-1)
            )
            fake_logits = disc.apply(
                d_params, jnp.concatenate([center, fake_frames], axis=-1)
            )
            return losses.gan_loss_d(
                real_logits, fake_logits, train_cfg.gan_loss
            )

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.d_params, d_updates
        )

        # ---------------- G update (against updated D) -------------
        feats_target = feat.apply(state.feat_params, stable)

        def g_loss_from_flows(flows_in):
            warped = warp_stages(flows_in, center)

            per_stage, terms_last = [], {}
            for s, w_s in enumerate(warped):
                fake_logits = disc.apply(
                    d_params, jnp.concatenate([center, w_s], axis=-1)
                )
                adv = losses.gan_loss_g(fake_logits, train_cfg.gan_loss)
                pix = losses.pixel_loss_photometric(
                    w_s, stable, train_cfg.pixel_loss_mode
                )
                feats_pred = feat.apply(state.feat_params, w_s)
                per = losses.feature_loss(feats_pred, feats_target)
                tmp = _temporal_term(train_cfg, w_s, stable)
                reg = losses.warp_smoothness_loss(flows_in[s])
                stage_total = (
                    adv
                    + train_cfg.w_pixel * pix
                    + train_cfg.w_feature * per
                    + train_cfg.w_temporal * tmp
                    + train_cfg.w_warp_reg * reg
                )
                per_stage.append(stage_total)
                terms_last = {
                    "adv": adv, "pixel": pix, "feature": per,
                    "temporal": tmp, "warp_reg": reg,
                }
            total = losses.stage_weighted(
                per_stage, train_cfg.stage_weights[: len(per_stage)]
            )
            return total, terms_last

        (g_loss, terms), dflows = jax.value_and_grad(
            g_loss_from_flows, has_aux=True
        )(flows)
        (g_grads,) = g_pullback(dflows)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.g_params, g_updates
        )

        metrics = {
            "loss_d": d_loss,
            "loss_g": g_loss,
            "grad_norm_g": optax_global_norm(g_grads),
            "grad_norm_d": optax_global_norm(d_grads),
            **terms,
        }
        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
            rng=rng,
            g_ema=_ema_update(train_cfg, state.g_ema, g_params),
        )
        return new_state, metrics

    return train_step


def _ema_update(train_cfg: TrainConfig, g_ema, g_params):
    """ema <- d*ema + (1-d)*params (no-op tree passthrough when off)."""
    if train_cfg.ema_decay <= 0 or g_ema is None:
        return g_ema
    d = train_cfg.ema_decay
    return jax.tree_util.tree_map(
        lambda e, p: d * e + (1.0 - d) * p, g_ema, g_params
    )


def _make_accum_train_step(
    model_cfg, train_cfg, gen, disc, feat, g_tx, d_tx, warp_stages
):
    """Gradient-accumulation variant (TrainConfig.grad_accum_steps > 1).

    The global batch splits into micro-batches scanned on device:
    phase 1 accumulates discriminator gradients (generator outputs
    detached) and applies ONE D update; phase 2 re-runs the generator
    per micro-batch under autodiff against the UPDATED discriminator,
    accumulates, and applies ONE G update.  Gradients are means over
    micro-batches — identical in expectation to a single large batch,
    at O(micro-batch) activation memory (the shared-vjp forward of the
    unaccumulated step would require keeping every micro-batch's
    residuals, defeating the purpose, so the generator forward runs in
    both phases here).
    """
    accum = train_cfg.grad_accum_steps

    def prepare(batch):
        stacks = to_unit(_fold(batch["stacks"]))
        stable = to_unit(_fold(batch["stable"]))
        if stacks.shape[0] % accum:
            raise ValueError(
                f"2*batch_size ({stacks.shape[0]}) must divide "
                f"grad_accum_steps ({accum})"
            )

        def split(x):
            return x.reshape((accum, -1) + x.shape[1:])

        return split(stacks), split(stable)

    def train_step(state, batch):
        stacks_mb, stable_mb = prepare(batch)
        rng, drop_rng = jax.random.split(state.rng)

        def g_apply(params, x):
            kwargs = {}
            if model_cfg.use_dropout:
                kwargs = {
                    "deterministic": False,
                    "rngs": {"dropout": drop_rng},
                }
            return gen.apply(params, x, **kwargs)

        zeros_like_tree = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: jnp.zeros_like(x, jnp.float32), t
        )

        # ---------------- phase 1: D gradient accumulation ----------
        def d_micro(carry, mb):
            stacks, stable = mb
            center = _center(stacks, model_cfg)
            flows = jax.lax.stop_gradient(g_apply(state.g_params, stacks))
            fake = jax.lax.stop_gradient(
                warp_stages(flows, center)[-1]
            )

            def d_loss_fn(d_params):
                real_logits = disc.apply(
                    d_params, jnp.concatenate([center, stable], axis=-1)
                )
                fake_logits = disc.apply(
                    d_params, jnp.concatenate([center, fake], axis=-1)
                )
                return losses.gan_loss_d(
                    real_logits, fake_logits, train_cfg.gan_loss
                )

            loss, grads = jax.value_and_grad(d_loss_fn)(state.d_params)
            acc_l, acc_g = carry
            return (
                acc_l + loss / accum,
                jax.tree_util.tree_map(
                    lambda a, g: a + g / accum, acc_g, grads
                ),
            ), None

        (d_loss, d_grads), _ = jax.lax.scan(
            d_micro,
            (jnp.zeros((), jnp.float32), zeros_like_tree(state.d_params)),
            (stacks_mb, stable_mb),
        )
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.d_params, d_updates
        )

        # ---------------- phase 2: G gradient accumulation ----------
        def g_micro(carry, mb):
            stacks, stable = mb
            center = _center(stacks, model_cfg)
            feats_target = feat.apply(state.feat_params, stable)

            def g_loss_fn(g_params):
                flows = g_apply(g_params, stacks)
                warped = warp_stages(flows, center)
                per_stage, terms_last = [], {}
                for s, w_s in enumerate(warped):
                    fake_logits = disc.apply(
                        d_params, jnp.concatenate([center, w_s], axis=-1)
                    )
                    adv = losses.gan_loss_g(
                        fake_logits, train_cfg.gan_loss
                    )
                    pix = losses.pixel_loss_photometric(
                        w_s, stable, train_cfg.pixel_loss_mode
                    )
                    per = losses.feature_loss(
                        feat.apply(state.feat_params, w_s), feats_target
                    )
                    tmp = _temporal_term(train_cfg, w_s, stable)
                    reg = losses.warp_smoothness_loss(flows[s])
                    per_stage.append(
                        adv
                        + train_cfg.w_pixel * pix
                        + train_cfg.w_feature * per
                        + train_cfg.w_temporal * tmp
                        + train_cfg.w_warp_reg * reg
                    )
                    terms_last = {
                        "adv": adv, "pixel": pix, "feature": per,
                        "temporal": tmp, "warp_reg": reg,
                    }
                total = losses.stage_weighted(
                    per_stage, train_cfg.stage_weights[: len(per_stage)]
                )
                return total, terms_last

            (loss, terms), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state.g_params)
            acc_l, acc_g, acc_t = carry
            return (
                acc_l + loss / accum,
                jax.tree_util.tree_map(
                    lambda a, g: a + g / accum, acc_g, grads
                ),
                jax.tree_util.tree_map(
                    lambda a, t: a + t / accum, acc_t, terms
                ),
            ), None

        zero_terms = {
            k: jnp.zeros((), jnp.float32)
            for k in ("adv", "pixel", "feature", "temporal", "warp_reg")
        }
        (g_loss, g_grads, terms), _ = jax.lax.scan(
            g_micro,
            (
                jnp.zeros((), jnp.float32),
                zeros_like_tree(state.g_params),
                zero_terms,
            ),
            (stacks_mb, stable_mb),
        )
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.g_params, g_updates
        )

        metrics = {
            "loss_d": d_loss,
            "loss_g": g_loss,
            "grad_norm_g": optax_global_norm(g_grads),
            "grad_norm_d": optax_global_norm(d_grads),
            **terms,
        }
        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
            rng=rng,
            g_ema=_ema_update(train_cfg, state.g_ema, g_params),
        )
        return new_state, metrics

    return train_step


def optax_global_norm(tree: Any) -> Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
    )

