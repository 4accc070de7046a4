import numpy as np, jax, jax.numpy as jnp
from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.config import PipelineConfig
from pwstablenet_tpu.utils.timing import device_time
rng = np.random.default_rng(0)
stab = Stabilizer(ModelConfig(), PipelineConfig(batch_windows=8))
x = jnp.asarray(rng.standard_normal((8, 256, 256, 21)).astype(np.float32))
fwd = jax.jit(stab.model.apply)
dt = device_time(lambda p, a: fwd(p, a), (stab.params, x), iters=10)
print(f"gen fwd b8: {dt*1e3:.2f} ms (was 6.75)")
# and the n=16 chunk
stab16 = Stabilizer(ModelConfig(), PipelineConfig(batch_windows=16), params=stab.params)
frames = jnp.asarray(rng.integers(0, 256, (22, 720, 1280, 3), np.uint8))
up = stab16._pallas_ok(frames.shape)
dt16 = device_time(lambda f: stab16._chunk_step(stab16.params, f, up), (frames,), iters=8)
print(f"chunk16 720p: {dt16*1e3:.2f} ms = {16/dt16:.0f} fps (was 25.8/620)")
