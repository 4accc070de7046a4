import time, dataclasses, jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.models import CascadedGenerator

def bench(name, cfg, B=8):
    model = CascadedGenerator(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 256, 256, cfg.stack_channels)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))/1e6
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    flows = fwd(params, x); _ = float(flows[-1].mean())
    t0 = time.perf_counter(); acc = jnp.zeros(())
    for _ in range(10):
        flows = fwd(params, x + acc * 1e-9); acc = flows[-1].mean()
    _ = float(acc)
    dt = (time.perf_counter()-t0)/10
    print(f"{name}: {n:.0f}M params, {dt*1e3:.1f} ms/b{B} = {B/dt:.0f} fps")

base = ModelConfig()
bench("baseline-2stage", base)
bench("1stage", dataclasses.replace(base, num_stages=1))
bench("no-norm", dataclasses.replace(base, norm="none"))
bench("group-norm", dataclasses.replace(base, norm="group"))
bench("2stage-warped-only", dataclasses.replace(base, interstage="warped"))
bench("2stage-features-only", dataclasses.replace(base, interstage="features"))
bench("2stage-instance-b1", base, B=1)
