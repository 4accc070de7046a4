"""Probe: ONE DP train step of the DEFAULT config (8-level bf16
instance-norm + dropout + EMA, 256^2) on the 8-device CPU mesh —
timing for the VERDICT r2 item-4 test."""
import os, time
import numpy as np
import jax

from pwstablenet_tpu.config import MeshConfig, ModelConfig, TrainConfig
from pwstablenet_tpu.data import make_train_batch
from pwstablenet_tpu.parallel import (
    data_parallel_step, make_mesh, replicate_tree, shard_batch,
)
from pwstablenet_tpu.train import create_train_state, make_train_step

cfg = ModelConfig(use_dropout=True)
tcfg = TrainConfig(batch_size=8, ema_decay=0.995)
t0 = time.perf_counter()
state, (gen, disc, feat) = create_train_state(cfg, tcfg, jax.random.PRNGKey(0))
print("init", time.perf_counter() - t0, flush=True)
mesh = make_mesh(MeshConfig())
print("mesh", mesh.devices.size, flush=True)
step = data_parallel_step(make_train_step(cfg, tcfg, gen, disc, feat), mesh)
state = replicate_tree(state, mesh)
batch = shard_batch(make_train_batch(8, 256, 256, cfg.temporal_window, seed=0), mesh)
t0 = time.perf_counter()
state, metrics = step(state, batch)
jax.block_until_ready(metrics)
print("step1 (compile+run)", time.perf_counter() - t0, flush=True)
print({k: float(v) for k, v in metrics.items()}, flush=True)
t0 = time.perf_counter()
state, metrics = step(state, batch)
jax.block_until_ready(metrics)
print("step2", time.perf_counter() - t0, flush=True)

# full-config clip-sharded inference chunk on the same mesh
from pwstablenet_tpu.config import PipelineConfig
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train.state import generator_params

stabber = Stabilizer(ModelConfig(), PipelineConfig(batch_windows=8),
                     params=generator_params(state), mesh=mesh)
clip = (np.random.default_rng(0).integers(
    0, 256, (24, 144, 256, 3))).astype(np.uint8)
t0 = time.perf_counter()
out, flows = stabber.stabilize_frames(clip)
print("clip-sharded inference chunk (default config, mesh x8):",
      out.shape, flows.shape, time.perf_counter() - t0, flush=True)
assert out.shape == clip.shape and np.isfinite(flows).all()
print("PROBE OK", flush=True)
