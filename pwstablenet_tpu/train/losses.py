"""Loss primitives and assembly (SURVEY.md C10-C15).

All losses are pure functions computed in float32 regardless of the
network compute dtype (GAN numerics under bf16 — SURVEY.md section 7
M4 "hard part #4").  The assembly mirrors the reference's objective:

  total_G = adv + w_pixel * L1 + w_feature * perceptual
          + w_temporal * temporal + w_warp_reg * smoothness,

summed over cascade stages with per-stage weights (later stages higher,
C15 intermediate supervision).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------- GAN --

def gan_loss_d(
    real_logits: Array, fake_logits: Array, kind: str = "lsgan"
) -> Array:
    """Discriminator objective on patch score maps (C10)."""
    real = real_logits.astype(jnp.float32)
    fake = fake_logits.astype(jnp.float32)
    if kind == "lsgan":
        return 0.5 * (
            jnp.mean((real - 1.0) ** 2) + jnp.mean(fake**2)
        )
    if kind == "vanilla":
        return 0.5 * (
            jnp.mean(_bce_with_logits(real, 1.0))
            + jnp.mean(_bce_with_logits(fake, 0.0))
        )
    if kind == "hinge":
        return 0.5 * (
            jnp.mean(jax.nn.relu(1.0 - real))
            + jnp.mean(jax.nn.relu(1.0 + fake))
        )
    raise ValueError(f"unknown gan loss {kind!r}")


def gan_loss_g(fake_logits: Array, kind: str = "lsgan") -> Array:
    """Generator adversarial objective (non-saturating)."""
    fake = fake_logits.astype(jnp.float32)
    if kind == "lsgan":
        return jnp.mean((fake - 1.0) ** 2)
    if kind == "vanilla":
        return jnp.mean(_bce_with_logits(fake, 1.0))
    if kind == "hinge":
        return -jnp.mean(fake)
    raise ValueError(f"unknown gan loss {kind!r}")


def _bce_with_logits(logits: Array, target: float) -> Array:
    # numerically stable BCE-with-logits against a constant target
    return jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


# ------------------------------------------------------- reconstruction --

def pixel_loss(pred: Array, target: Array) -> Array:
    """L1 between warped output and GT stable frame (C11)."""
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def pixel_loss_photometric(
    pred: Array, target: Array, mode: str = "l1"
) -> Array:
    """C11 pixel loss with optional photometric invariance.

    Motivation (round-3 failure-mode sweep): under strong auto-exposure
    steps the unstable frame and the GT stable frame differ by a sudden
    multiplicative gain the warp cannot (and should not) reproduce — a
    plain L1 then rewards geometric distortion that happens to darken /
    brighten regions toward the target (measured: distortion 0.67 at 4x
    exposure steps).  Modes:

    - ``l1``: the plain reference loss.
    - ``mean_matched``: per-sample, per-channel multiplicative gain
      match in [0, 1] intensity space before the L1.  The gain is the
      closed-form brightness ratio (stop-gradiented so the generator
      cannot chase it); exposure steps cancel to first order while
      geometric error is fully penalized.
    - ``gradient``: L1 on spatial finite differences — exact invariance
      to any per-frame additive offset and insensitivity to smooth
      gain, at the cost of weighing texture edges over flat regions.
    """
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    if mode == "l1":
        return jnp.mean(jnp.abs(p - t))
    if mode == "mean_matched":
        # [-1, 1] -> [0, 1] intensity, where exposure acts as a gain
        p01 = (p + 1.0) * 0.5
        t01 = (t + 1.0) * 0.5
        axes = tuple(range(1, p01.ndim - 1))  # per sample, per channel
        gain = (
            jnp.mean(t01, axis=axes, keepdims=True)
            / (jnp.mean(p01, axis=axes, keepdims=True) + 1e-4)
        )
        gain = jax.lax.stop_gradient(jnp.clip(gain, 0.5, 2.0))
        return jnp.mean(jnp.abs(p01 * gain - t01)) * 2.0  # back to [-1,1] scale
    if mode == "gradient":
        dy = (p[:, 1:] - p[:, :-1]) - (t[:, 1:] - t[:, :-1])
        dx = (p[:, :, 1:] - p[:, :, :-1]) - (t[:, :, 1:] - t[:, :, :-1])
        return jnp.mean(jnp.abs(dy)) + jnp.mean(jnp.abs(dx))
    raise ValueError(f"unknown pixel_loss_mode {mode!r}")


def feature_loss(
    feats_pred: Sequence[Array], feats_target: Sequence[Array]
) -> Array:
    """Perceptual distance over a feature pyramid (C12)."""
    total = jnp.zeros((), jnp.float32)
    for fp, ft in zip(feats_pred, feats_target):
        total = total + jnp.mean(
            jnp.abs(fp.astype(jnp.float32) - ft.astype(jnp.float32))
        )
    return total / max(len(feats_pred), 1)


# ------------------------------------------------------------ temporal --

def temporal_loss(stabilized_pair: Array) -> Array:
    """Smoothness of consecutive stabilized outputs (C13).

    ``stabilized_pair``: (B, 2, H, W, C) — outputs for frames t-1 and t
    of the same clip.  Penalizes their difference; static-camera GT
    makes adjacent stable frames nearly identical, so this directly
    suppresses residual jitter.  NOTE: a panning stable camera makes
    adjacent GT frames legitimately differ — this raw form then fights
    the pan; prefer ``temporal_loss_compensated`` when GT pairs exist.
    """
    a = stabilized_pair[:, 0].astype(jnp.float32)
    b = stabilized_pair[:, 1].astype(jnp.float32)
    return jnp.mean(jnp.abs(a - b))


def temporal_loss_compensated(
    stabilized_pair: Array, stable_pair: Array
) -> Array:
    """Motion-compensated temporal consistency (C13, demanding form).

    Penalizes the deviation of the OUTPUT's temporal change from the
    GROUND TRUTH's temporal change: ``|Δout − Δgt|`` with
    ``Δx = x_{t+1} − x_t``.  A genuine pan appears identically in both
    deltas and cancels (first-order motion compensation by the GT
    stable-to-stable motion itself — no flow estimation needed), while
    residual jitter survives in Δout and is suppressed.  Reduces to the
    raw ``temporal_loss`` exactly when the GT camera is static.
    """
    d_out = (
        stabilized_pair[:, 1].astype(jnp.float32)
        - stabilized_pair[:, 0].astype(jnp.float32)
    )
    d_gt = (
        stable_pair[:, 1].astype(jnp.float32)
        - stable_pair[:, 0].astype(jnp.float32)
    )
    return jnp.mean(jnp.abs(d_out - d_gt))


# --------------------------------------------------- warp regularization --

def warp_smoothness_loss(flow: Array) -> Array:
    """Total-variation penalty on the warp field (C14): neighboring
    pixels' displacements agree (shape preservation)."""
    f = flow.astype(jnp.float32)
    dy = f[:, 1:, :, :] - f[:, :-1, :, :]
    dx = f[:, :, 1:, :] - f[:, :, :-1, :]
    return jnp.mean(jnp.abs(dy)) + jnp.mean(jnp.abs(dx))


def stage_weighted(
    per_stage: Sequence[Array], weights: Sequence[float]
) -> Array:
    """Weighted sum over cascade stages (C15); weights are normalized."""
    w = jnp.asarray(weights, jnp.float32)
    w = w / jnp.sum(w)
    total = jnp.zeros((), jnp.float32)
    for i, loss in enumerate(per_stage):
        total = total + w[i] * loss
    return total
