"""Conv building blocks for the generator / discriminator (SURVEY.md C5).

Pix2Pix-style stride-2 encoder and transpose-conv decoder blocks, NHWC,
lowered through XLA's `conv_general_dilated` onto the MXU.  Activations
run in a configurable compute dtype (bfloat16 by default) with float32
parameters; normalization statistics are always computed in float32.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial normalization.

    Hand-written instead of ``nn.GroupNorm(group_size=1)``: that lowers
    to one reduction per channel and measured ~40x slower end-to-end on
    v5e (930ms vs 24ms for the full cascade).  This is a single fused
    mean/variance over the spatial axes in float32.
    """

    dtype: Dtype = jnp.bfloat16
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        # one-pass statistics: E[x] and E[x^2] reduce in the SAME fused
        # sweep over the activation (the centered two-pass form costs an
        # extra full HBM read per norm; f32 accumulation keeps
        # E[x^2]-mu^2 well-conditioned for post-conv activations)
        mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
        ex2 = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
        var = jnp.maximum(ex2 - jnp.square(mu), 0.0)
        y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class BatchNorm(nn.Module):
    """Stats-free batch normalization (per-channel over batch+space).

    Pix2pix-style GANs use batch statistics at train AND test time, so
    no running averages are kept — this stays a pure function (no
    mutable collections through the jitted train step).  Under data
    parallelism the reduction is over the GLOBAL batch: the batch axis
    is sharded, and XLA's SPMD partitioner turns the mean into a
    cross-device collective automatically.
    """

    dtype: Dtype = jnp.bfloat16
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=(0, 1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=(0, 1, 2), keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


def make_norm(kind: str, dtype: Dtype, name: Optional[str] = None):
    """Normalization factory: batch | instance | group | none.

    Instance norm is the default for the GAN (per-sample statistics, no
    cross-device sync needed in the data-parallel train step); batch
    norm uses global batch statistics (collective under sharding)."""
    if kind == "none":
        return lambda x: x
    if kind == "instance":
        return InstanceNorm(dtype=dtype, name=name)
    if kind == "group":
        return nn.GroupNorm(num_groups=8, dtype=dtype, name=name)
    if kind == "batch":
        return BatchNorm(dtype=dtype, name=name)
    raise ValueError(f"unknown norm kind {kind!r}")


class DownBlock(nn.Module):
    """Stride-2 4x4 conv -> norm -> LeakyReLU."""

    features: int
    norm: str = "instance"
    leaky_slope: float = 0.2
    use_norm: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_norm:
            x = make_norm(self.norm, self.dtype, name="norm")(x)
        return nn.leaky_relu(x, negative_slope=self.leaky_slope)


class PhaseConvTranspose2x(nn.Module):
    """Stride-2 4x4 transposed conv as ONE dense stride-1 2x2 conv.

    Mathematically identical to ``nn.ConvTranspose(k=(4,4), s=(2,2),
    SAME)``: each output phase (dy, dx) of the 2x upsample reads a
    one-pixel-shifted 2x2 input window with the disjoint kernel-tap
    subset ``W[2u+dy, 2v+dx]`` (impulse-derived mapping; parity probe
    in ``scratch/r7_deconv_probe.py``).  All four phases therefore come
    out of a single stride-1 2x2 conv over the (1,1)-padded input with
    ``4*features`` output channels; interleaving its shifted slices is
    the 2x upsample.  Equal flop count, but XLA sees a plain dense conv
    forward AND plain-conv gradients instead of the input-dilation
    lowering whose kernel-layout copies are the train step's largest
    non-math cost (~8.3 ms/step measured, round 3).

    The parameter tree ('kernel' (4,4,ci,co), 'bias' (co,)) is
    bit-compatible with ``nn.ConvTranspose``, so checkpoints and the
    torch importer work unchanged; outputs agree to float tolerance
    (taps accumulate in a different order).
    """

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        co = self.features
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (4, 4, ci, co),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (co,), jnp.float32
        )
        dt = self.dtype
        # (4,4,ci,co) -> (u,dy,v,dx,ci,co) -> 2x2 conv kernel with
        # phase-major (dy,dx,co) output channels
        w2 = (
            kernel.astype(dt)
            .reshape(2, 2, 2, 2, ci, co)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(2, 2, ci, 4 * co)
        )
        n, h, w, _ = x.shape
        y = jax.lax.conv_general_dilated(
            x.astype(dt),
            w2,
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y.reshape(n, h + 1, w + 1, 2, 2, co)
        rows = []
        for dy in (0, 1):
            cols = [y[:, dy:h + dy, dx:w + dx, dy, dx] for dx in (0, 1)]
            rows.append(jnp.stack(cols, axis=3))   # (n, h, w, 2, co)
        y = jnp.stack(rows, axis=2)                # (n, h, 2, w, 2, co)
        return y.reshape(n, 2 * h, 2 * w, co) + bias.astype(dt)


def make_deconv_2x(features: int, dtype: Dtype, name: str, impl: str):
    """The decoder's 2x upsampler: reference lowering or phase form."""
    if impl == "deconv":
        return nn.ConvTranspose(
            features,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding="SAME",  # flax ConvTranspose: SAME == exact 2x up
            dtype=dtype,
            name=name,
        )
    if impl == "phase_conv":
        return PhaseConvTranspose2x(features, dtype=dtype, name=name)
    raise ValueError(f"unknown decoder_impl {impl!r} (deconv | phase_conv)")


class UpBlock(nn.Module):
    """Stride-2 4x4 transpose conv -> norm -> ReLU (+ optional dropout)."""

    features: int
    norm: str = "instance"
    use_norm: bool = True
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16
    impl: str = "deconv"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = make_deconv_2x(self.features, self.dtype, "deconv", self.impl)(x)
        if self.use_norm:
            x = make_norm(self.norm, self.dtype, name="norm")(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(rate=self.dropout_rate)(
                x, deterministic=deterministic
            )
        return nn.relu(x)
