"""Kernel perf on REALISTIC stabilization flows: global shake + mild local."""
import jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.kernels.grid_sample_pallas import grid_sample_pallas
from pwstablenet_tpu.utils.timing import device_time
rng = np.random.default_rng(0)

def realistic_flow(B, H, W, shake=0.06, local=0.01):
    # global per-frame translation (the dominant stabilization correction)
    g = (rng.random((B, 1, 1, 2)).astype(np.float32) - 0.5) * 2 * shake
    lf = (rng.random((B, 16, 16, 2)).astype(np.float32) - 0.5) * 2 * local
    loc = jax.image.resize(jnp.asarray(lf), (B, H, W, 2), "bilinear")
    return jnp.asarray(g) + loc

for (B, H, W, C) in [(8, 256, 256, 3), (8, 720, 1280, 3), (8, 1080, 1920, 3)]:
    img = jnp.asarray(rng.random((B, H, W, C), np.float32))
    grid = flow_to_grid(realistic_flow(B, H, W))
    ref = grid_sample(img, grid)
    out = grid_sample_pallas(img, grid)
    err = float(jnp.abs(out - ref).max())
    f = jax.jit(lambda i, g: grid_sample_pallas(i, g))
    dt = device_time(f, (img, grid), iters=10)
    bw = (2*B*H*W*C*4 + B*H*W*2*4)/dt/1e9
    print(f"{H}x{W}x{B}: err {err:.2e}, {dt*1e3:.2f} ms = {B/dt:.0f} fps, {bw:.0f} GB/s", flush=True)
print("DONE")
