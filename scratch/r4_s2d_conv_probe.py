"""Round-2 probe: space-to-depth for the level-0 conv.

The UNet's first conv (256^2, cin=21 -> 64, 4x4 stride 2, pad 1)
measured only 7.7 TF/s (scratch/r4_int8_conv_probe.py) — cin=21 leaves
the MXU's 128-deep contraction mostly idle.  Space-to-depth (the
standard TPU trick for shallow-input convs, cf. ResNet TPU impls)
rewrites it as a 2x2 stride-1 conv over 84 channels:

  y[i,j] = sum_{ky,kx<4} x[2i+ky-1, 2j+kx-1] k[ky,kx]
         = sum_{by,bx<2} sum_{ty,tx<2} x2[(i+dy),(j+dx)][block(by,bx)] ...

Concretely: pad x by 1 (top/left) + 1 (bottom/right) -> 258^2, then
split into even/odd phases so each output tap (ky,kx) lands in one of
4 phase-shifted s2d tensors; a 4x4 stride-2 conv == a 2x2 stride-1
conv on the s2d layout with channels 4*21=84.

Parity: exact up to float reassociation (checked vs the direct conv).

  scratch/tpu_run.sh 900 scratch/r4_s2d_conv_probe.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from pwstablenet_tpu.utils.timing import device_time

rng = np.random.default_rng(0)
B, H, W, CIN, COUT = 16, 256, 256, 21, 64
x = jnp.asarray(rng.standard_normal((B, H, W, CIN)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((4, 4, CIN, COUT)) * 0.05, jnp.bfloat16)
DN = ("NHWC", "HWIO", "NHWC")


def direct(xx, kk):
    return jax.lax.conv_general_dilated(
        xx, kk, (2, 2), [(1, 1), (1, 1)], dimension_numbers=DN,
        preferred_element_type=jnp.float32,
    )


def s2d(xx, kk):
    """Space-to-depth rewrite of 4x4/s2/p1.

    Output pixel (i, j) reads input rows 2i-1..2i+2.  Pad by (1, 2) on
    each spatial dim -> rows 2i..2i+3 of the padded tensor; s2d the
    padded tensor into 2x2 blocks: padded row 2i+r (r in 0..3) = block
    row i + r//2, phase r%2.  So the 4x4 taps become a 2x2 block window
    with all 4 phases stacked on channels.
    """
    xp = jnp.pad(xx, ((0, 0), (1, 2), (1, 2), (0, 0)))  # (B, 259, 259, C)
    # make even dims for blocking: 259 -> 260
    xp = jnp.pad(xp, ((0, 0), (0, 1), (0, 1), (0, 0)))  # (B, 260, 260, C)
    Bh, Hp, Wp, C = xp.shape
    xb = xp.reshape(Bh, Hp // 2, 2, Wp // 2, 2, C)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(
        Bh, Hp // 2, Wp // 2, 4 * C
    )  # channels ordered (py, px, c)
    # kernel: tap (ky, kx) multiplies block (ky//2, kx//2), phase
    # (ky%2, kx%2) -> 2x2 kernel over 4C channels
    kb = jnp.zeros((2, 2, 4 * C, COUT), kk.dtype)
    for ky in range(4):
        for kx in range(4):
            by, py = divmod(ky, 2)
            bx, px = divmod(kx, 2)
            c0 = (py * 2 + px) * C
            kb = kb.at[by, bx, c0 : c0 + C, :].set(kk[ky, kx])
    out = jax.lax.conv_general_dilated(
        xb, kb, (1, 1), [(0, 0), (0, 0)], dimension_numbers=DN,
        preferred_element_type=jnp.float32,
    )
    return out[:, : H // 2, : W // 2]


def s2d_slices(xx, kk):
    """Phase split via strided slices (no 6-D transpose): channels
    ordered (py, px, c) like s2d()."""
    xp = jnp.pad(xx, ((0, 0), (1, 2), (1, 2), (0, 0)))
    xp = jnp.pad(xp, ((0, 0), (0, 1), (0, 1), (0, 0)))
    C = xx.shape[-1]
    phases = [
        xp[:, py::2, px::2, :] for py in range(2) for px in range(2)
    ]
    xb = jnp.concatenate(phases, axis=-1)
    kb = jnp.zeros((2, 2, 4 * C, COUT), kk.dtype)
    for ky in range(4):
        for kx in range(4):
            by, py = divmod(ky, 2)
            bx, px = divmod(kx, 2)
            c0 = (py * 2 + px) * C
            kb = kb.at[by, bx, c0 : c0 + C, :].set(kk[ky, kx])
    out = jax.lax.conv_general_dilated(
        xb, kb, (1, 1), [(0, 0), (0, 0)], dimension_numbers=DN,
        preferred_element_type=jnp.float32,
    )
    return out[:, : H // 2, : W // 2]


ref = direct(x, k)
got = s2d(x, k)
print("shapes:", ref.shape, got.shape, flush=True)
err = float(jnp.max(jnp.abs(ref - got[:, : ref.shape[1], : ref.shape[2]])))
print(f"parity max abs err: {err:.5f} (bf16 compute)", flush=True)

got2 = s2d_slices(x, k)
err2 = float(jnp.max(jnp.abs(ref - got2)))
print(f"parity (slices variant): {err2:.5f}", flush=True)

fd = jax.jit(direct)
fs = jax.jit(s2d)
fs2 = jax.jit(s2d_slices)
dtd = device_time(lambda: fd(x, k), (), iters=10)
dts = device_time(lambda: fs(x, k), (), iters=10)
dts2 = device_time(lambda: fs2(x, k), (), iters=10)
flops = 2 * B * (H // 2) * (W // 2) * COUT * 16 * CIN
print(f"direct 4x4/s2: {dtd*1e3:.3f} ms ({flops/dtd/1e12:.1f} TF/s)",
      flush=True)
print(f"s2d 2x2/s1:    {dts*1e3:.3f} ms ({flops/dts/1e12:.1f} TF/s)  "
      f"speedup {dtd/dts:.2f}x", flush=True)
print(f"s2d slices:    {dts2*1e3:.3f} ms ({flops/dts2/1e12:.1f} TF/s)  "
      f"speedup {dtd/dts2:.2f}x", flush=True)

# also the second conv (cin=64 already lane-friendly, for reference)
x2 = jnp.asarray(rng.standard_normal((B, 128, 128, 64)), jnp.bfloat16)
k2 = jnp.asarray(rng.standard_normal((4, 4, 64, 128)) * 0.05, jnp.bfloat16)
fd2 = jax.jit(direct)
dt2 = device_time(lambda: fd2(x2, k2), (), iters=10)
fl2 = 2 * B * 64 * 64 * 128 * 16 * 64
print(f"level-1 direct: {dt2*1e3:.3f} ms ({fl2/dt2/1e12:.1f} TF/s)",
      flush=True)
print("DONE", flush=True)
