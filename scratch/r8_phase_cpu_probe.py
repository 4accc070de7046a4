"""phase_conv CPU-relative probe (VERDICT r4 item 2: "measure or
close", dead-tunnel branch).

CAVEAT, stated up front: the lever exists to bypass the TPU/XLA
input-dilation lowering's f32 kernel-layout copies (~8.3 ms of the
45.5 ms TPU train step).  XLA:CPU lowers ConvTranspose differently
(no MXU, different layout machinery), so a CPU A/B bounds NOTHING
about the TPU bill — it only answers "does the reformulation cost
anything where we can measure today?".  The TPU step A/B
(scratch/r7_phase_step_probe.py) stays queued in r7_tpu_queue.sh and
remains the flip-the-default gate.

Times, at the measured CPU envelope scale (64^2 lvl6 base32 bs4) and
at generator-fwd default scale (256^2 8-level b4):
  - full adversarial train step, deconv vs phase_conv
  - generator forward only, deconv vs phase_conv

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scratch/r8_phase_cpu_probe.py
"""
import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.data import make_train_batch
from pwstablenet_tpu.models import CascadedGenerator
from pwstablenet_tpu.train import create_train_state, make_train_step


def wall(fn, args, iters):
    fn(*args)  # warm (compile)
    r = None
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / iters


ENV = dict(model_resolution=(64, 64), num_levels=6,
           base_features=32, max_features=256, use_dropout=True)

for impl in ("deconv", "phase_conv"):
    cfg = ModelConfig(decoder_impl=impl, **ENV)
    tcfg = TrainConfig(batch_size=4)
    state, (gen, disc, feat) = create_train_state(
        cfg, tcfg, jax.random.PRNGKey(0)
    )
    step = jax.jit(make_train_step(cfg, tcfg, gen, disc, feat))
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_train_batch(4, 64, 64, cfg.temporal_window, seed=1)
    )
    box = [state]

    def chained(b):
        box[0], m = step(box[0], b)
        return m

    dt = wall(chained, (batch,), iters=3)
    print(f"train step 64^2 env b4 [{impl}]: {dt*1e3:.0f} ms", flush=True)

for impl in ("deconv", "phase_conv"):
    cfg = ModelConfig(decoder_impl=impl)
    model = CascadedGenerator(cfg)
    x = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((4, 256, 256, cfg.stack_channels))
        .astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    dt = wall(fwd, (params, x), iters=3)
    print(f"generator fwd 256^2 default b4 [{impl}]: {dt*1e3:.0f} ms",
          flush=True)
