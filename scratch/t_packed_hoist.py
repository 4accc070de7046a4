import numpy as np, jax, jax.numpy as jnp
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import grid_sample_pallas_packed
from pwstablenet_tpu.utils.timing import device_time
rng = np.random.default_rng(0)
img8 = jnp.asarray(rng.integers(0, 256, (8, 720, 1280, 3), np.uint8))
lf = (rng.random((8, 8, 8, 2), np.float32) - 0.5) * 0.1
flow = jax.image.resize(jnp.asarray(lf), (8, 720, 1280, 2), "bilinear")
grid = flow_to_grid(flow)
dt = device_time(lambda i, g: grid_sample_pallas_packed(i, g), (img8, grid), iters=10)
print(f"packed+hoist 720p warp x8: {dt*1e3:.2f} ms (was 7.67)")
