"""Numpy emulation of the pallas kernel algorithm to find the logic bug."""
import os; os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.ops.warp import flow_to_grid

rng = np.random.default_rng(0)
B, H, W, C = 1, 16, 128, 1
img = np.asarray(rng.random((B, H, W, C), np.float32))
lf = (rng.random((B, 4, 4, 2), np.float32) - 0.5) * 0.1
flow = np.asarray(jax.image.resize(jnp.asarray(lf), (B, H, W, 2), "bilinear"))
grid = np.asarray(flow_to_grid(jnp.asarray(flow)))
ref = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))

h, w, rw = H, W, 16
TILE = 8
out = np.zeros_like(img)
for t in range(h // TILE):
    r0 = t * TILE
    gx = grid[0, r0:r0+TILE, :, 0]; gy = grid[0, r0:r0+TILE, :, 1]
    x = np.clip((gx + 1) * 0.5 * (w - 1), 0, w - 1)
    y = np.clip((gy + 1) * 0.5 * (h - 1), 0, h - 1)
    x0 = np.floor(x).astype(np.int32); y0 = np.floor(y).astype(np.int32)
    fx = x - x0; fy = y - y0
    w00 = (1-fy)*(1-fx); w01 = (1-fy)*fx; w10 = fy*(1-fx); w11 = fy*fx
    yb = np.clip(y0.min(), 0, max(h - rw, 0))
    ly0 = np.clip(y0 - yb, 0, rw - 1)
    lx0 = np.clip(x0, 0, w - 1); lx1 = np.clip(x0 + 1, 0, w - 1)
    a00 = np.zeros((TILE, w)); a01 = np.zeros((TILE, w)); a10 = np.zeros((TILE, w)); a11 = np.zeros((TILE, w))
    for r in range(rw):
        row = img[0, yb + r, :, 0]
        h0 = row[np.clip(lx0, 0, 127)]
        h1 = row[np.clip(lx1, 0, 127)]
        sel0 = ly0 == r; sel1 = ly0 == r - 1
        a00 = np.where(sel0, h0, a00); a01 = np.where(sel0, h1, a01)
        a10 = np.where(sel1, h0, a10); a11 = np.where(sel1, h1, a11)
    out[0, r0:r0+TILE, :, 0] = w00*a00 + w01*a01 + w10*a10 + w11*a11
err = np.abs(out - ref)
print("emu max err", err.max(), "frac", (err > 1e-4).mean())
i = np.unravel_index(err.argmax(), err.shape)
print("at", i, "out", out[i], "ref", ref[i])
