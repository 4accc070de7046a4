"""Post-kernel-change probe: 720p throughput at 16 vs 24 vs 32 windows."""
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.utils.timing import device_time

rng = np.random.default_rng(0)
cfg = ModelConfig()
T = cfg.temporal_window
params = None
for n in (16, 24, 32):
    stab = Stabilizer(cfg, PipelineConfig(batch_windows=n), params=params)
    params = stab.params
    frames = jnp.asarray(
        rng.integers(0, 256, (n + T - 1, 720, 1280, 3), np.uint8)
    )
    up = stab._pallas_ok(frames.shape)
    dt = device_time(
        lambda f, s=stab, u=up: s._chunk_step(s.params, f, u),
        (frames,), iters=8,
    )
    print(f"720p chunk{n}: {dt*1e3:.2f} ms = {n/dt:.0f} fps (pallas {up})")
