import time, jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.ops import grid_sample, warp_image

H, W, C, B = 720, 1280, 3, 8
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((B, H, W, C), np.float32))
# smooth small flow: upsampled from low res
lf = (rng.random((B, 16, 16, 2), np.float32) - 0.5) * 0.1
flow = jax.image.resize(jnp.asarray(lf), (B, H, W, 2), "bilinear")
grid = flow + jnp.stack(jnp.meshgrid(jnp.linspace(-1,1,W), jnp.linspace(-1,1,H), indexing="xy"), -1)[None]

f = jax.jit(lambda i, g: grid_sample(i, g, padding_mode="border", align_corners=True))
out = f(img, grid); out.block_until_ready()
t0 = time.perf_counter()
N = 20
for _ in range(N):
    out = f(img, grid)
out.block_until_ready()
dt = (time.perf_counter() - t0) / N
print(f"XLA fallback grid_sample 720p x{B}: {dt*1e3:.2f} ms/call, {B/dt:.0f} frames/s")
print(f"  bytes moved ~= {2*B*H*W*C*4/1e6:.0f} MB, bw = {2*B*H*W*C*4/dt/1e9:.1f} GB/s")

# bf16 variant
img16 = img.astype(jnp.bfloat16)
f16 = jax.jit(lambda i, g: grid_sample(i, g))
out = f16(img16, grid); out.block_until_ready()
t0 = time.perf_counter()
for _ in range(N):
    out = f16(img16, grid)
out.block_until_ready()
dt = (time.perf_counter() - t0) / N
print(f"XLA fallback bf16: {dt*1e3:.2f} ms/call, {B/dt:.0f} frames/s")
