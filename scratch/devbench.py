import dataclasses, jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.models import CascadedGenerator
from pwstablenet_tpu.utils import device_time

def run(name, cfg, B=8):
    try:
        model = CascadedGenerator(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, 256, 256, cfg.stack_channels)).astype(np.float32))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        fwd = jax.jit(lambda x: model.apply(params, x))
        dt = device_time(fwd, (x,), iters=10)
        print(f"RESULT {name}: {dt*1e3:.2f} ms/b{B} = {B/dt:.0f} fps (device)", flush=True)
    except Exception as e:
        print(f"RESULT {name}: ERROR {type(e).__name__}: {str(e)[:200]}", flush=True)

base = ModelConfig()
run("both+instance", base)
run("features+instance", dataclasses.replace(base, interstage="features"))
run("1stage", dataclasses.replace(base, num_stages=1))
run("both+instance-b16", base, B=16)
print("DONE", flush=True)
