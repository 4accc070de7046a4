"""Drive the flagship model end-to-end on real TPU: full 256x256 2-stage cascade."""
import time, jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.models import CascadedGenerator

cfg = ModelConfig()  # full size: 8 levels, 2 stages, 7-frame stack, 256x256
model = CascadedGenerator(cfg)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((8, 256, 256, cfg.stack_channels)).astype(np.float32))
t0 = time.perf_counter()
params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
print(f"init {time.perf_counter()-t0:.1f}s; params {sum(p.size for p in jax.tree_util.tree_leaves(params))/1e6:.1f}M")
fwd = jax.jit(lambda p, x: model.apply(p, x))
t0 = time.perf_counter()
flows = fwd(params, x)
jax.block_until_ready(flows)
print(f"compile+first {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
for _ in range(20):
    flows = fwd(params, x)
jax.block_until_ready(flows)
dt = (time.perf_counter()-t0)/20
print(f"fwd: {dt*1e3:.2f} ms/batch8 = {8/dt:.0f} frames/s; flows {[tuple(f.shape) for f in flows]}")
print("finite:", all(np.isfinite(np.asarray(f)).all() for f in flows))

# dependency-chained timing (defeats any async/caching artifacts)
t0 = time.perf_counter()
acc = jnp.zeros(())
for _ in range(20):
    flows = fwd(params, x + acc * 1e-9)
    acc = flows[1].mean()
acc.block_until_ready()
dt = (time.perf_counter()-t0)/20
print(f"chained fwd: {dt*1e3:.2f} ms/batch8 = {8/dt:.0f} frames/s")
# bf16 params variant
p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
f16 = jax.jit(lambda p, x: model.apply(p, x))
flows = f16(p16, x.astype(jnp.bfloat16)); jax.block_until_ready(flows)
t0 = time.perf_counter()
acc = jnp.zeros((), jnp.bfloat16)
for _ in range(20):
    flows = f16(p16, (x + acc.astype(jnp.float32) * 1e-9).astype(jnp.bfloat16))
    acc = flows[1].astype(jnp.bfloat16).mean()
acc.block_until_ready()
dt = (time.perf_counter()-t0)/20
print(f"bf16-params chained: {dt*1e3:.2f} ms/batch8 = {8/dt:.0f} frames/s")
