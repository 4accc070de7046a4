"""XLA flag probe: generator fwd b16 + full chunk16 under a given
XLA_FLAGS environment (pass flags via env; this script just measures)."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.utils.timing import device_time

print("XLA_FLAGS:", os.environ.get("XLA_FLAGS", "<none>"))
rng = np.random.default_rng(0)
cfg = ModelConfig()
n = 16
stab = Stabilizer(cfg, PipelineConfig(batch_windows=n))
T = cfg.temporal_window
mh, mw = cfg.model_resolution

stacks = jnp.asarray(
    rng.standard_normal((n, mh, mw, cfg.stack_channels)).astype(np.float32)
)
gfwd = jax.jit(stab.model.apply)
dtg = device_time(lambda: gfwd(stab.params, stacks), (), iters=10)
print(f"generator fwd b16: {dtg*1e3:.2f} ms")

frames = jnp.asarray(
    rng.integers(0, 256, (n + T - 1, 720, 1280, 3), np.uint8)
)
up = stab._pallas_ok(frames.shape)
dt = device_time(
    lambda: stab._chunk_step(stab.params, frames, up), (), iters=8
)
print(f"chunk16 720p: {dt*1e3:.2f} ms = {n/dt:.0f} fps")
