"""Packed uint8 kernel: device parity + perf at video sizes."""
import numpy as np, jax, jax.numpy as jnp
from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import (
    grid_sample_pallas, grid_sample_pallas_packed)
from pwstablenet_tpu.utils.timing import device_time

rng = np.random.default_rng(0)

# parity at moderate size
img_u8 = rng.integers(0, 256, (2, 64, 256, 3), np.uint8)
lf = (rng.random((2, 8, 8, 2), np.float32) - 0.5) * 0.15
flow = jax.image.resize(jnp.asarray(lf), (2, 64, 256, 2), "bilinear")
grid = flow_to_grid(flow)
imgf = jnp.asarray(img_u8).astype(jnp.float32) / 127.5 - 1.0
ref = grid_sample(imgf, grid)
ref_u8 = np.clip((np.asarray(ref) + 1) * 127.5, 0, 255).round().astype(np.int16)
out = grid_sample_pallas_packed(jnp.asarray(img_u8), grid)
diff = np.abs(np.asarray(out).astype(np.int16) - ref_u8)
print("packed parity: max code diff", int(diff.max()),
      "frac>0:", float((diff > 0).mean()))

# perf: 8x720p
img8 = jnp.asarray(rng.integers(0, 256, (8, 720, 1280, 3), np.uint8))
lf = (rng.random((8, 8, 8, 2), np.float32) - 0.5) * 0.1
flow = jax.image.resize(jnp.asarray(lf), (8, 720, 1280, 2), "bilinear")
grid = flow_to_grid(flow)
dt = device_time(lambda i, g: grid_sample_pallas_packed(i, g), (img8, grid), iters=10)
print(f"packed 720p warp x8: {dt*1e3:.2f} ms (f32 3ch kernel: 13.7)")

imgf8 = img8.astype(jnp.float32) / 127.5 - 1.0
dtf = device_time(lambda i, g: grid_sample_pallas(i, g), (imgf8, grid), iters=10)
print(f"f32 720p warp x8 (control): {dtf*1e3:.2f} ms")

# 1080p
img1080 = jnp.asarray(rng.integers(0, 256, (8, 1080, 1920, 3), np.uint8))
lf = (rng.random((8, 8, 8, 2), np.float32) - 0.5) * 0.1
flow = jax.image.resize(jnp.asarray(lf), (8, 1080, 1920, 2), "bilinear")
grid1080 = flow_to_grid(flow)
dt1080 = device_time(
    lambda i, g: grid_sample_pallas_packed(i, g), (img1080, grid1080), iters=5)
print(f"packed 1080p warp x8: {dt1080*1e3:.2f} ms")
