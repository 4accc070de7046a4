import jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import grid_sample_pallas
from pwstablenet_tpu.utils.timing import device_time
rng = np.random.default_rng(0)
for (B, H, W, C) in [(8, 256, 256, 3), (8, 720, 1280, 3), (8, 1080, 1920, 3)]:
    img = jnp.asarray(rng.random((B, H, W, C), np.float32))
    lf = (rng.random((B, 16, 16, 2), np.float32) - 0.5) * 0.1
    flow = jax.image.resize(jnp.asarray(lf), (B, H, W, 2), "bilinear")
    grid = flow_to_grid(flow)
    f = jax.jit(lambda i, g: grid_sample_pallas(i, g))
    dt = device_time(f, (img, grid), iters=10)
    print(f"pallas {H}x{W}x{B}: {dt*1e3:.2f} ms = {B/dt:.0f} fps", flush=True)
print("DONE")
