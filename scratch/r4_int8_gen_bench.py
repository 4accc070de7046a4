"""Measure the int8 generator against bf16 on TPU v5e: generator
forward at flagship size, plus the full 720p chunk16 path (the
inference headline).  Parity: flow error vs the float model."""
import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.models import CascadedGenerator
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.utils.timing import device_time

cfg = ModelConfig()  # bf16 compute
qcfg = dataclasses.replace(cfg, quantized_inference=True)
h, w = cfg.model_resolution
rng = np.random.default_rng(0)

# nontrivial params (randomized heads)
import flax

gen = CascadedGenerator(cfg)
x0 = jnp.zeros((1, h, w, cfg.stack_channels), jnp.float32)
params = flax.core.unfreeze(jax.jit(gen.init)(jax.random.PRNGKey(0), x0))
for s in range(cfg.num_stages):
    head = params["params"][f"stage{s}"]["head"]
    head["kernel"] = jnp.asarray(
        rng.standard_normal(head["kernel"].shape).astype(np.float32) * 0.03
    )

x = jnp.asarray(
    rng.uniform(-1, 1, (16, h, w, cfg.stack_channels)).astype(np.float32)
)
f_fwd = jax.jit(lambda p, xx: CascadedGenerator(cfg).apply(p, xx)[-1])
q_fwd = jax.jit(lambda p, xx: CascadedGenerator(qcfg).apply(p, xx)[-1])

ff = np.asarray(f_fwd(params, x))
qf = np.asarray(q_fwd(params, x))
err = np.abs(ff - qf).max()
scale = np.abs(ff).max()
print(f"flow parity: max abs err {err:.5f} (flow scale {scale:.4f}, "
      f"rel {err/max(scale,1e-9):.4f})", flush=True)

dtf = device_time(lambda: f_fwd(params, x), (), iters=10)
dtq = device_time(lambda: q_fwd(params, x), (), iters=10)
print(f"generator fwd b16 256x256: bf16 {dtf*1e3:.2f} ms  "
      f"int8 {dtq*1e3:.2f} ms  speedup {dtf/dtq:.2f}x", flush=True)

# ---- 720p end-to-end chunk16 ----
T = cfg.temporal_window
n16 = 16
frames = jnp.asarray(
    rng.integers(0, 256, (n16 + T - 1, 720, 1280, 3)).astype(np.uint8)
)
for label, c in (("bf16", cfg), ("int8", qcfg)):
    stab = Stabilizer(c, PipelineConfig(batch_windows=n16), params=params)
    step = stab._chunk_step
    use_pallas = stab._pallas_ok(frames.shape)
    dt = device_time(lambda: step(stab.params, frames, use_pallas), (),
                     iters=5)
    print(f"720p chunk16 {label}: {dt*1e3:.2f} ms = "
          f"{n16/dt:.0f} frames/sec/chip", flush=True)
print("DONE", flush=True)
