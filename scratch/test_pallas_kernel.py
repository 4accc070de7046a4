"""Quick dev test: pallas kernel vs XLA fallback, interpret on CPU then real TPU."""
import sys, os
mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
if mode == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np, time
from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import grid_sample_pallas

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
B, H, W, C = 2, 64, 256, 3
img = jnp.asarray(rng.random((B, H, W, C), np.float32))
# smooth flow (realistic: upsampled low-res, bounded)
lf = (rng.random((B, 8, 8, 2), np.float32) - 0.5) * 0.15
flow = jax.image.resize(jnp.asarray(lf), (B, H, W, 2), "bilinear")
grid = flow_to_grid(flow)

for pad in ("border", "zeros"):
    ref = grid_sample(img, grid, padding_mode=pad, align_corners=True)
    out = grid_sample_pallas(img, grid, padding_mode=pad, align_corners=True,
                             interpret=(mode == "cpu"))
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    print(f"pad={pad}: max err {err:.2e}", "OK" if err < 1e-5 else "FAIL")

if mode == "tpu":
    # timing at 256x256 (training-res warp)
    B2 = 8
    img2 = jnp.asarray(rng.random((B2, 256, 256, C), np.float32))
    lf2 = (rng.random((B2, 16, 16, 2), np.float32) - 0.5) * 0.15
    flow2 = jax.image.resize(jnp.asarray(lf2), (B2, 256, 256, 2), "bilinear")
    grid2 = flow_to_grid(flow2)
    f_pal = jax.jit(lambda i, g: grid_sample_pallas(i, g))
    f_xla = jax.jit(lambda i, g: grid_sample(i, g))
    for name, f in [("pallas", f_pal), ("xla", f_xla)]:
        o = f(img2, grid2); o.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(50): o = f(img2, grid2)
        o.block_until_ready()
        dt = (time.perf_counter() - t0) / 50
        print(f"{name} 256x256x{B2}: {dt*1e6:.0f} us")
