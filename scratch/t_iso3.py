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
out = grid_sample_pallas(img, grid, row_window=16, interpret=False)
ref = grid_sample(img, grid)
err = np.abs(np.asarray(out) - np.asarray(ref))[0, :, :, 0]
print("max", err.max())
bad = np.argwhere(err > 1e-4)
print("num bad", len(bad), "rows:", sorted(set(bad[:,0].tolist())))
print("cols range:", bad[:,1].min() if len(bad) else "-", bad[:,1].max() if len(bad) else "-")
# inspect one bad pixel
if len(bad):
    r, c = bad[0]
    g = np.asarray(grid)[0, r, c]
    x = (g[0]+1)*0.5*(127); y = (g[1]+1)*0.5*15
    print(f"pixel ({r},{c}): x={x:.3f} y={y:.3f} out={np.asarray(out)[0,r,c,0]:.4f} ref={np.asarray(ref)[0,r,c,0]:.4f}")
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    im = np.asarray(img)[0,:,:,0]
    print("corners", im[y0, x0], im[y0, min(x0+1,127)], im[min(y0+1,15), x0], im[min(y0+1,15), min(x0+1,127)])
