"""Level-0 conv phase-split probe (VERDICT r3 item 7).

The UNet's first conv (4x4 stride-2, cin=21) makes XLA phase-split the
input (space-to-depth movement measured at ~1 ms of the 16.7 ms
generator forward; explicit space-to-depth was 0.52x — see
scratch/r4_s2d_conv_probe.py).  This probes two ALGEBRAIC
reformulations whose input transform is FREE (a reshape of contiguous
memory) or cheap, trading structured-zero flops for no phase split:

  wpair : W=2W' pairs are memory-contiguous in NHWC, so
          (B,H,W,C) -> (B,H,W/2,2C) is a pure reshape.  The conv
          becomes kernel (4,3,2C,F), strides (2,1) — W-dim stride
          eliminated, 1.5x nominal flops (structured zeros).
  hwpair: additionally pair rows (needs a real transpose), kernel
          (3,3,4C,F), strides (1,1) — NO strided dims left, 2.25x
          nominal flops.

Parity is exact (same taps, zeros contribute nothing).  On CPU this
verifies parity; on TPU it times all three against the direct conv.

  python scratch/r7_conv_probe.py          # parity (any backend) + timing
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

B, H, W, CI, CO = 16, 256, 256, 21, 64
DN = ("NHWC", "HWIO", "NHWC")


def wpair_kernel(w: np.ndarray) -> np.ndarray:
    """(4,4,ci,co) stride-2 pad-1 kernel -> (4,3,2ci,co) stride-(2,1)."""
    kh, kw, ci, co = w.shape
    assert kw == 4
    w2 = np.zeros((kh, 3, 2 * ci, co), w.dtype)
    w2[:, 0, ci:] = w[:, 0]   # pair j-1, odd col  = kx=0 tap
    w2[:, 1, :ci] = w[:, 1]   # pair j,   even col = kx=1
    w2[:, 1, ci:] = w[:, 2]   # pair j,   odd col  = kx=2
    w2[:, 2, :ci] = w[:, 3]   # pair j+1, even col = kx=3
    return w2


def hwpair_kernel(w: np.ndarray) -> np.ndarray:
    """(4,4,ci,co) stride-2 pad-1 kernel -> (3,3,4ci,co) stride-1."""
    w2 = wpair_kernel(w)      # (4, 3, 2ci, co)
    kh, kq, c2, co = w2.shape
    w3 = np.zeros((3, kq, 2 * c2, co), w.dtype)
    w3[0, :, c2:] = w2[0]     # row pair i-1, odd row = ky=0 tap
    w3[1, :, :c2] = w2[1]     # row pair i,  even row = ky=1
    w3[1, :, c2:] = w2[2]     # row pair i,   odd row = ky=2
    w3[2, :, :c2] = w2[3]     # row pair i+1, even row = ky=3
    return w3


def conv_direct(x, w):
    return lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=DN)


def conv_wpair(x, w2):
    xb = x.reshape(x.shape[0], x.shape[1], x.shape[2] // 2,
                   2 * x.shape[3])  # contiguous: pure reshape
    return lax.conv_general_dilated(
        xb, w2, (2, 1), ((1, 1), (1, 1)), dimension_numbers=DN)


def conv_hwpair(x, w3):
    b, h, wdt, c = x.shape
    xb = x.reshape(b, h, wdt // 2, 2 * c)
    # row pairing needs a transpose (rows are not adjacent in memory)
    xb = xb.reshape(b, h // 2, 2, wdt // 2, 2 * c)
    xb = jnp.transpose(xb, (0, 1, 3, 2, 4)).reshape(
        b, h // 2, wdt // 2, 4 * c)
    return lax.conv_general_dilated(
        xb, w3, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN)


def main():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, H, W, CI)).astype(np.float32)
    w = (rng.standard_normal((4, 4, CI, CO)) / 18.0).astype(np.float32)

    ref = np.asarray(jax.jit(conv_direct)(x, w))
    outs = {
        "wpair": np.asarray(jax.jit(conv_wpair)(x, jnp.asarray(wpair_kernel(w)))),
        "hwpair": np.asarray(jax.jit(conv_hwpair)(x, jnp.asarray(hwpair_kernel(w)))),
    }
    for name, o in outs.items():
        err = np.abs(o - ref).max()
        print(f"parity[{name}]: shape {o.shape} max_abs_err {err:.3e}")
        assert o.shape == ref.shape and err < 1e-4, name
    print("PARITY OK")

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print("cpu backend: skipping timing")
        return

    import sys
    sys.path.insert(0, "/root/repo")
    from pwstablenet_tpu.utils.timing import device_time

    xb16 = jnp.asarray(x, jnp.bfloat16)
    wb16 = jnp.asarray(w, jnp.bfloat16)
    fns = {
        "direct": (jax.jit(conv_direct), (xb16, wb16)),
        "wpair": (jax.jit(conv_wpair),
                  (xb16, jnp.asarray(wpair_kernel(w), jnp.bfloat16))),
        "hwpair": (jax.jit(conv_hwpair),
                   (xb16, jnp.asarray(hwpair_kernel(w), jnp.bfloat16))),
    }
    for name, (fn, args) in fns.items():
        t = device_time(fn, args, iters=20)
        print(f"time[{name}]: {t*1e6:.1f} us  "
              f"({2*B*(H//2)*(W//2)*4*4*CI*CO/t/1e12:.2f} eff TF/s)")


if __name__ == "__main__":
    main()
