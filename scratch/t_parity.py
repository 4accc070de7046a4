import jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import grid_sample_pallas
rng = np.random.default_rng(0)
B, H, W, C = 2, 64, 256, 3
img = jnp.asarray(rng.random((B, H, W, C), np.float32))
lf = (rng.random((B, 8, 8, 2), np.float32) - 0.5) * 0.15
flow = jax.image.resize(jnp.asarray(lf), (B, H, W, 2), "bilinear")
grid = flow_to_grid(flow)
for pad in ("border", "zeros"):
    ref = grid_sample(img, grid, padding_mode=pad, align_corners=True)
    out = grid_sample_pallas(img, grid, padding_mode=pad, align_corners=True)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    print(f"pad={pad}: max err {err:.2e}", "OK" if err < 1e-5 else "FAIL")
