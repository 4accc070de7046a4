"""Device parity + perf of the restructured kernel at video sizes."""
import numpy as np, jax, jax.numpy as jnp
from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import (
    grid_sample_pallas, grid_sample_grad_pallas)
from pwstablenet_tpu.utils.timing import device_time

rng = np.random.default_rng(0)

# parity at moderate size
img = jnp.asarray(rng.random((2, 64, 256, 3), np.float32))
lf = (rng.random((2, 8, 8, 2), np.float32) - 0.5) * 0.15
flow = jax.image.resize(jnp.asarray(lf), (2, 64, 256, 2), "bilinear")
grid = flow_to_grid(flow)
for pm in ("border", "zeros"):
    ref = grid_sample(img, grid, padding_mode=pm)
    out = grid_sample_pallas(img, grid, padding_mode=pm)
    print(pm, "fwd mse", float(jnp.mean((out - ref) ** 2)))
ct = jnp.asarray(rng.standard_normal(img.shape).astype(np.float32))
exp = jax.grad(lambda g: jnp.sum(ct * grid_sample(img, g)))(grid)
got = grid_sample_grad_pallas(img, grid, ct)
print("grad mse", float(jnp.mean((got - exp) ** 2)))

# perf: 8x720p warp (the pipeline's hot call)
img = jnp.asarray(rng.random((8, 720, 1280, 3), np.float32))
lf = (rng.random((8, 8, 8, 2), np.float32) - 0.5) * 0.1
flow = jax.image.resize(jnp.asarray(lf), (8, 720, 1280, 2), "bilinear")
grid = flow_to_grid(flow)
ref = grid_sample(img, grid)
out = grid_sample_pallas(img, grid)
print("720p fwd mse", float(jnp.mean((out - ref) ** 2)))
dt = device_time(lambda i, g: grid_sample_pallas(i, g), (img, grid), iters=10)
print(f"720p warp x8: {dt*1e3:.2f} ms (was 13.7)")

# grad perf at training shape (8x256x256x3)
img = jnp.asarray(rng.random((8, 256, 256, 3), np.float32))
lf = (rng.random((8, 8, 8, 2), np.float32) - 0.5) * 0.1
flow = jax.image.resize(jnp.asarray(lf), (8, 256, 256, 2), "bilinear")
grid = flow_to_grid(flow)
ct = jnp.asarray(rng.standard_normal(img.shape).astype(np.float32))
dtg = device_time(
    lambda i, g, c: grid_sample_grad_pallas(i, g, c), (img, grid, ct),
    iters=10)
print(f"grad 256x8: {dtg*1e3:.2f} ms")
