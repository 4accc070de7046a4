import os; os.environ["JAX_PLATFORMS"] = "cpu"; os.environ["PALLAS_AXON_POOL_IPS"] = ""
import jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import grid_sample_pallas

rng = np.random.default_rng(0)
B, H, W, C = 1, 8, 128, 1
img = jnp.asarray(rng.random((B, H, W, C), np.float32))

def check(name, flow):
    grid = flow_to_grid(jnp.asarray(flow))
    out = grid_sample_pallas(img, grid, row_window=8, interpret=True)
    ref = grid_sample(img, grid)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    print(f"{name}: max {err.max():.3e} frac {(err>1e-4).mean():.3f}")

z = np.zeros((B, H, W, 2), np.float32)
check("identity", z)
fx = z.copy(); fx[..., 0] = 2.0 / (W - 1) * 3.7   # x shift by 3.7 px
check("x-shift-frac", fx)
fy = z.copy(); fy[..., 1] = 2.0 / (H - 1) * 2.3   # y shift by 2.3 px
check("y-shift-frac", fy)
fi = z.copy(); fi[..., 1] = 2.0 / (H - 1) * 2.0   # y shift by integer 3
check("y-shift-int", fi)
fxy = z.copy(); fxy[..., 0] = 2/(W-1)*1.5; fxy[..., 1] = 2/(H-1)*1.5
check("xy-shift", fxy)
# spatially varying y
vy = z.copy(); vy[..., 1] = np.linspace(0, 2/(H-1)*4, W, dtype=np.float32)[None, None, :]
check("y-varying-along-x", vy)
vx = z.copy(); vx[..., 0] = np.linspace(0, 2/(W-1)*4, H, dtype=np.float32)[None, :, None, ]
check("x-varying-along-y", vx)
