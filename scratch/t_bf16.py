import jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.utils.timing import device_time

rng = np.random.default_rng(0)
stab = Stabilizer(ModelConfig(), PipelineConfig(batch_windows=8))
T = stab.model_cfg.temporal_window
frames = jnp.asarray(rng.random((8 + T - 1, 720, 1280, 3), np.float32) * 2 - 1)
step = stab._chunk_step

dt = device_time(lambda f: step(stab.params, f, True), (frames,), iters=10)
print(f"f32 720p chunk: {dt*1e3:.2f} ms = {8/dt:.0f} fps", flush=True)

frames16 = frames.astype(jnp.bfloat16)
p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, stab.params)
dt = device_time(lambda f: step(p16, f, True), (frames16,), iters=10)
print(f"bf16 720p chunk: {dt*1e3:.2f} ms = {8/dt:.0f} fps", flush=True)

# parity of bf16 path vs f32
o32, f32f = step(stab.params, frames, True)
o16, f16f = step(p16, frames16, True)
print("bf16 vs f32 out err:", float(jnp.abs(o16.astype(jnp.float32) - o32).max()), flush=True)
print("DONE", flush=True)
