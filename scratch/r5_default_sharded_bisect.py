"""Bisect the default-config sharded-step XLA-CPU compile blowup.

The FULL default config (8-level 256^2 b8, dropout+EMA) did not finish
local XLA-CPU compile in 60 min (the TPU compile server does the same
step in ~31 s).  This probe keeps the full STRUCTURE (8 levels, 256^2,
bf16 compute, instance norm, dropout rngs, EMA, 2 stages, 8-way mesh)
and varies channel widths to find what actually blows up.

Usage: r5_default_sharded_bisect.py <base> <max> [dropout(0/1)] [ema(0/1)]
"""
import sys
import time

import numpy as np
import jax

from pwstablenet_tpu.config import MeshConfig, ModelConfig, TrainConfig
from pwstablenet_tpu.data import make_train_batch
from pwstablenet_tpu.parallel import (
    data_parallel_step, make_mesh, replicate_tree, shard_batch,
)
from pwstablenet_tpu.train import create_train_state, make_train_step

base = int(sys.argv[1]); mx = int(sys.argv[2])
use_dropout = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
ema = 0.995 if (len(sys.argv) <= 4 or int(sys.argv[4])) else 0.0

cfg = ModelConfig(base_features=base, max_features=mx,
                  use_dropout=use_dropout)
tcfg = TrainConfig(batch_size=8, ema_decay=ema)
print(f"config: base={base} max={mx} dropout={use_dropout} ema={ema}",
      flush=True)
state, (gen, disc, feat) = create_train_state(cfg, tcfg, jax.random.PRNGKey(0))
mesh = make_mesh(MeshConfig())
step = data_parallel_step(make_train_step(cfg, tcfg, gen, disc, feat), mesh)
state = replicate_tree(state, mesh)
batch = shard_batch(make_train_batch(8, 256, 256, cfg.temporal_window, seed=0),
                    mesh)
t0 = time.perf_counter()
lowered = step.lower(state, batch)
print(f"lowered in {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print(f"compiled in {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
state2, metrics = compiled(state, batch)
jax.block_until_ready(metrics)
print(f"ran in {time.perf_counter()-t0:.1f}s", flush=True)
vals = {k: float(v) for k, v in metrics.items()}
print(vals, flush=True)
assert all(np.isfinite(v) for v in vals.values()), vals
print("BISECT OK", flush=True)
