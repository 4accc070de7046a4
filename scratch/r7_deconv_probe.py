"""Decoder deconv -> phase-conv + depth-to-space probe (VERDICT r3
item 7: attack the 8.3 ms/step conv-kernel layout copies / input-
dilation machinery from an untried angle).

A stride-2 4x4 ConvTranspose's output phases (dy,dx in {0,1}^2) each
read a 2x2 input window with a disjoint 2x2 subset of the 4x4 kernel
(impulse-measured mapping for lax.conv_transpose SAME):

  out[2m+dy, 2n+dx] = sum_{u,v in {0,1}}
      x[m-1+dy+u, n-1+dx+v] * W[2u+dy, 2v+dx]

The windows of the two phases differ by a one-pixel shift, so ONE
plain stride-1 2x2 conv over the (1,1)-padded input producing 4*cout
channels yields every phase as a shifted slice; interleaving the
slices is depth-to-space.  Identical flop count (16 cin cout per input
pixel, +O(1/H) edge), no input dilation, no strided dims — the MXU
sees a dense stride-1 conv and the grad passes are plain-conv grads.

CPU: exact-parity check against flax ConvTranspose (f32).
TPU: device-times the full set of UNet decoder deconv shapes (b16
256^2 working res) fwd and fwd+grad, direct vs phase form.

  python scratch/r7_deconv_probe.py
"""
import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def phase_kernel(w: np.ndarray) -> np.ndarray:
    """(4,4,ci,co) deconv kernel -> (2,2,ci,4co) phase-conv kernel.

    Output channel layout: phase-major blocks [(dy,dx) = (0,0), (0,1),
    (1,0), (1,1)], each of width co — matching a depth-to-space that
    reshapes (H, W, 4co) -> (H, W, 2, 2, co) -> (2H, 2W, co).
    """
    kh, kw, ci, co = w.shape
    assert kh == 4 and kw == 4
    out = np.zeros((2, 2, ci, 4 * co), w.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            blk = (dy * 2 + dx) * co
            for u in (0, 1):
                for v in (0, 1):
                    out[u, v, :, blk:blk + co] = w[2 * u + dy, 2 * v + dx]
    return out


def deconv_direct(x, w, b):
    y = jax.lax.conv_transpose(
        x, w, strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def deconv_phase(x, w2, b):
    n, h, wd, c = x.shape
    co = w2.shape[-1] // 4
    # one dense 2x2 conv over the (1,1)-padded input: (h+1, w+1, 4co)
    y = jax.lax.conv_general_dilated(
        x, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # phase (dy,dx) is block (dy*2+dx) sliced at offset (dy,dx);
    # stack + reshape interleaves (depth-to-space with shifted taps)
    y = y.reshape(n, h + 1, wd + 1, 4, co)
    rows = []
    for dy in (0, 1):
        cols = [
            y[:, dy:h + dy, dx:wd + dx, dy * 2 + dx] for dx in (0, 1)
        ]
        rows.append(jnp.stack(cols, axis=3))          # (n, h, w, 2, co)
    y = jnp.stack(rows, axis=2)                       # (n, h, 2, w, 2, co)
    y = y.reshape(n, 2 * h, 2 * wd, co)
    return y + b


def main():
    rng = np.random.default_rng(0)

    # ---- parity: against BOTH lax.conv_transpose and flax ConvTranspose
    x = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    w = (rng.standard_normal((4, 4, 5, 7)) / 8.0).astype(np.float32)
    b = rng.standard_normal((7,)).astype(np.float32)

    ref = np.asarray(deconv_direct(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    got = np.asarray(deconv_phase(jnp.asarray(x), jnp.asarray(phase_kernel(w)), jnp.asarray(b)))
    err = np.abs(ref - got).max()
    print(f"parity vs lax.conv_transpose: shape {got.shape} ref {ref.shape} "
          f"max_abs_err {err:.3e}")
    assert ref.shape == got.shape and err < 1e-5

    mod = nn.ConvTranspose(7, kernel_size=(4, 4), strides=(2, 2),
                           padding="SAME")
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    ref2 = np.asarray(mod.apply(params, jnp.asarray(x)))
    err2 = np.abs(ref2 - got).max()
    print(f"parity vs flax ConvTranspose: max_abs_err {err2:.3e}")
    assert err2 < 1e-5

    # grad parity (the point: plain-conv grads replace dilated-conv grads)
    def loss_direct(w_):
        return jnp.sum(deconv_direct(jnp.asarray(x), w_, jnp.asarray(b)) ** 2)

    def loss_phase(w_):
        return jnp.sum(deconv_phase(
            jnp.asarray(x), _phase_jax(w_), jnp.asarray(b)) ** 2)

    def _phase_jax(w_):
        # jax version of phase_kernel (gather/stack — differentiable)
        cols = []
        for dy in (0, 1):
            for dx in (0, 1):
                taps = jnp.stack([
                    jnp.stack([
                        w_[2 * u + dy, 2 * v + dx]
                        for v in (0, 1)], axis=0)
                    for u in (0, 1)], axis=0)  # (2,2,ci,co)
                cols.append(taps)
        return jnp.concatenate(cols, axis=-1)

    g1 = jax.grad(loss_direct)(jnp.asarray(w))
    g2 = jax.grad(loss_phase)(jnp.asarray(w))
    gerr = np.abs(np.asarray(g1) - np.asarray(g2)).max() / (
        np.abs(np.asarray(g1)).max() + 1e-9)
    print(f"kernel-grad parity (rel): {gerr:.3e}")
    assert gerr < 1e-5
    print("PARITY OK")

    if jax.devices()[0].platform == "cpu":
        print("cpu backend: skipping timing")
        return

    import sys
    sys.path.insert(0, "/root/repo")
    from pwstablenet_tpu.utils.timing import device_time

    # UNet decoder deconv shapes at 256^2 working res, b16, default cfg
    # (input channels include skip concats): (h, w, cin, cout)
    B = 16
    shapes = [
        (2, 2, 512, 512), (4, 4, 1536, 512), (8, 8, 1536, 512),
        (16, 16, 1536, 512), (32, 32, 1536, 256), (64, 64, 768, 128),
        (128, 128, 384, 64), (128, 128, 192, 64),  # head_up approx
    ]
    tot_d = tot_p = 0.0
    for (h, wd, ci, co) in shapes:
        xs = jnp.asarray(rng.standard_normal((B, h, wd, ci)), jnp.bfloat16)
        ws = jnp.asarray(rng.standard_normal((4, 4, ci, co)) / 64.0,
                         jnp.bfloat16)
        bs = jnp.zeros((co,), jnp.bfloat16)
        w2 = jnp.asarray(phase_kernel(np.asarray(ws, np.float32)),
                         jnp.bfloat16)
        td = device_time(jax.jit(deconv_direct), (xs, ws, bs), iters=20)
        tp = device_time(jax.jit(deconv_phase), (xs, w2, bs), iters=20)
        tot_d += td
        tot_p += tp
        fl = 2 * B * h * wd * 16 * ci * co
        print(f"fwd {h:4d}x{wd:<4d} ci{ci:5d} co{co:4d}: direct "
              f"{td*1e6:8.1f} us ({fl/td/1e12:5.1f} TF/s)  phase "
              f"{tp*1e6:8.1f} us ({fl/tp/1e12:5.1f} TF/s)  "
              f"{td/tp:4.2f}x")
    print(f"fwd total: direct {tot_d*1e3:.3f} ms  phase {tot_p*1e3:.3f} ms  "
          f"{tot_d/tot_p:.2f}x")

    # fwd+grad (vjp wrt x and kernel — the train-step pattern)
    tot_d = tot_p = 0.0
    for (h, wd, ci, co) in shapes:
        xs = jnp.asarray(rng.standard_normal((B, h, wd, ci)), jnp.bfloat16)
        ws = jnp.asarray(rng.standard_normal((4, 4, ci, co)) / 64.0,
                         jnp.bfloat16)
        bs = jnp.zeros((co,), jnp.bfloat16)
        w2 = jnp.asarray(phase_kernel(np.asarray(ws, np.float32)),
                         jnp.bfloat16)

        def f_d(x_, w_):
            return jnp.sum(deconv_direct(x_, w_, bs).astype(jnp.float32) ** 2)

        def f_p(x_, w_):
            return jnp.sum(deconv_phase(x_, w_, bs).astype(jnp.float32) ** 2)

        td = device_time(jax.jit(jax.grad(f_d, argnums=(0, 1))), (xs, ws),
                         iters=20)
        tp = device_time(jax.jit(jax.grad(f_p, argnums=(0, 1))), (xs, w2),
                         iters=20)
        tot_d += td
        tot_p += tp
        print(f"grad {h:4d}x{wd:<4d} ci{ci:5d} co{co:4d}: direct "
              f"{td*1e6:8.1f} us  phase {tp*1e6:8.1f} us  {td/tp:4.2f}x")
    print(f"grad total: direct {tot_d*1e3:.3f} ms  phase {tot_p*1e3:.3f} ms  "
          f"{tot_d/tot_p:.2f}x")


if __name__ == "__main__":
    main()
