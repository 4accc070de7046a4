import numpy as np, jax, jax.numpy as jnp
from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import (
    grid_sample_pallas_padded, grid_sample_grad_pallas_padded)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((2, 64, 208, 3), np.float32))
flow = jnp.asarray((rng.random((2, 64, 208, 2), np.float32) - 0.5) * 2.5)
grid = flow_to_grid(flow)
ref = grid_sample(img, grid, padding_mode="reflection")
out = grid_sample_pallas_padded(img, grid, padding_mode="reflection")
print("fwd mse", float(jnp.mean((out - ref) ** 2)))
ct = jnp.asarray(rng.standard_normal(img.shape).astype(np.float32))
exp = jax.grad(lambda g: jnp.sum(ct * grid_sample(img, g, padding_mode="reflection")))(grid)
got = grid_sample_grad_pallas_padded(img, grid, ct, padding_mode="reflection")
print("grad mse", float(jnp.mean((got - exp) ** 2)))
