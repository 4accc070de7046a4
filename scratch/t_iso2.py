import jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import grid_sample_pallas

rng = np.random.default_rng(0)
B, H, W, C = 1, 16, 128, 1
img = jnp.asarray(rng.random((B, H, W, C), np.float32))

def check(name, flow, rw):
    grid = flow_to_grid(jnp.asarray(flow))
    out = grid_sample_pallas(img, grid, row_window=rw, interpret=False)
    ref = grid_sample(img, grid)
    err = np.abs(np.asarray(out) - np.asarray(ref))[0, :, :, 0]
    rows = np.where((err > 1e-4).any(axis=1))[0]
    print(f"{name} rw={rw}: max {err.max():.3e} bad-rows {rows}")

z = np.zeros((B, H, W, 2), np.float32)
fy = z.copy(); fy[..., 1] = 2.0 / (H - 1) * 2.3
check("y-shift-2.3px", fy, 12)
fy2 = z.copy(); fy2[..., 1] = -2.0 / (H - 1) * 2.3
check("y-shift-neg", fy2, 12)
