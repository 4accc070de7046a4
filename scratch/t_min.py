import time, jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import grid_sample_pallas

rng = np.random.default_rng(0)
B, H, W, C = 1, 16, 128, 1
img = jnp.asarray(rng.random((B, H, W, C), np.float32))
lf = (rng.random((B, 4, 4, 2), np.float32) - 0.5) * 0.1
flow = jax.image.resize(jnp.asarray(lf), (B, H, W, 2), "bilinear")
grid = flow_to_grid(flow)
t0 = time.perf_counter()
out = grid_sample_pallas(img, grid, row_window=8)
out.block_until_ready()
print(f"compile+run {time.perf_counter()-t0:.1f}s")
ref = grid_sample(img, grid)
print("max err", np.abs(np.asarray(out) - np.asarray(ref)).max())
