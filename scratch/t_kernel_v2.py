"""Kernel v2 on real TPU: parity at several sizes + device timing vs XLA."""
import jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import grid_sample_pallas, pallas_supported
from pwstablenet_tpu.utils.timing import device_time

rng = np.random.default_rng(0)

def case(B, H, W, C, mag=0.1):
    img = jnp.asarray(rng.random((B, H, W, C), np.float32))
    lf = (rng.random((B, 16, 16, 2), np.float32) - 0.5) * mag
    flow = jax.image.resize(jnp.asarray(lf), (B, H, W, 2), "bilinear")
    return img, flow_to_grid(flow)

for (B, H, W, C) in [(2, 64, 256, 3), (2, 256, 256, 3), (2, 720, 1280, 3)]:
    img, grid = case(B, H, W, C)
    for pad in ("border", "zeros"):
        ref = grid_sample(img, grid, padding_mode=pad)
        out = grid_sample_pallas(img, grid, padding_mode=pad)
        err = float(jnp.abs(out - ref).max())
        print(f"{H}x{W} pad={pad}: max err {err:.2e}", "OK" if err < 1e-5 else "FAIL", flush=True)

# timing
for (B, H, W, C) in [(8, 256, 256, 3), (8, 720, 1280, 3), (8, 1080, 1920, 3)]:
    img, grid = case(B, H, W, C)
    f_pal = jax.jit(lambda i, g: grid_sample_pallas(i, g))
    dt = device_time(f_pal, (img, grid), iters=10)
    print(f"pallas {H}x{W}x{B}: {dt*1e3:.2f} ms = {B/dt:.0f} fps, "
          f"{(2*B*H*W*C*4 + B*H*W*2*4)/dt/1e9:.0f} GB/s", flush=True)
    if H <= 720:
        f_xla = jax.jit(lambda i, g: grid_sample(i, g))
        dtx = device_time(f_xla, (img, grid), iters=3)
        print(f"xla    {H}x{W}x{B}: {dtx*1e3:.2f} ms = {B/dtx:.0f} fps", flush=True)
print("DONE")
