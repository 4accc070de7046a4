import os, sys
if "cpu" in sys.argv: os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import grid_sample_pallas

rng = np.random.default_rng(0)
B, H, W, C = 1, 16, 128, 1
img = jnp.asarray(rng.random((B, H, W, C), np.float32))
lf = (rng.random((B, 4, 4, 2), np.float32) - 0.5) * 0.1
flow = jax.image.resize(jnp.asarray(lf), (B, H, W, 2), "bilinear")
grid = flow_to_grid(flow)
out = grid_sample_pallas(img, grid, row_window=8, interpret=("cpu" in sys.argv))
ref = grid_sample(img, grid)
err = np.abs(np.asarray(out) - np.asarray(ref))
print("max err", err.max(), "at", np.unravel_index(err.argmax(), err.shape))
print("frac wrong:", (err > 1e-4).mean())
# identity grid sanity
gid = flow_to_grid(jnp.zeros_like(flow))
out2 = grid_sample_pallas(img, gid, row_window=8, interpret=("cpu" in sys.argv))
print("identity max err", np.abs(np.asarray(out2) - np.asarray(img)).max())
