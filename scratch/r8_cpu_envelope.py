"""CPU training envelope (VERDICT r4 item 1, dead-tunnel branch).

The TPU tunnel has been dead since mid-round-3; rather than bank a
third round of staged-only experiments, this probe measures what the
1-core CPU host can actually train, so the ranked A/Bs
(pixel_loss_mode, w_feature, curriculum-vs-not) can run at the largest
feasible scale.  Measures, per candidate config:

  - jit compile time of the fused adversarial step
  - steady-state wall time per step (pure compute, pre-made batch)
  - projected wall-clock for a 400/600-step run

plus the CPU-side costs that bound the rest of the protocol: synthetic
pair-clip generation and Stabilizer inference at eval scale.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scratch/r8_cpu_envelope.py
"""
import time

import numpy as np

import jax

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.data.synthetic import make_train_batch
from pwstablenet_tpu.train import create_train_state, make_train_step

CONFIGS = {
    # name: (H=W, num_levels, base, max, batch)
    "64lvl6_b32_bs4": (64, 6, 32, 256, 4),
    "64lvl6_b32_bs8": (64, 6, 32, 256, 8),
    "64lvl6_b64_bs4": (64, 6, 64, 512, 4),
    "96lvl5_b32_bs4": (96, 5, 32, 256, 4),
    "128lvl7_b32_bs4": (128, 7, 32, 256, 4),
    "128lvl7_b64_bs4": (128, 7, 64, 512, 4),
}

for name, (res, lvl, base, mx, bs) in CONFIGS.items():
    cfg = ModelConfig(
        model_resolution=(res, res), num_levels=lvl,
        base_features=base, max_features=mx, use_dropout=True,
    )
    tcfg = TrainConfig(batch_size=bs)
    state, (gen, disc, feat) = create_train_state(
        cfg, tcfg, jax.random.PRNGKey(0)
    )
    step = jax.jit(make_train_step(cfg, tcfg, gen, disc, feat), donate_argnums=0)
    batch = jax.tree_util.tree_map(
        jax.numpy.asarray, make_train_batch(bs, res, res, cfg.temporal_window)
    )
    t0 = time.time()
    state, m = step(state, batch)
    jax.block_until_ready(m)
    compile_s = time.time() - t0
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    dt = (time.time() - t0) / iters
    print(
        f"{name}: compile {compile_s:.1f}s  step {dt*1e3:.0f} ms  "
        f"400 steps = {dt*400/60:.1f} min  600 = {dt*600/60:.1f} min",
        flush=True,
    )

# ---- data-side costs ----
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip  # noqa: E402

t0 = time.time()
s, u = synthetic_pair_clip(48, 160, 224, seed=0, **RICH)
print(f"pair clip 48f 160x224 RICH: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
s2, u2 = synthetic_pair_clip(48, 320, 448, seed=0, **RICH)
print(f"pair clip 48f 320x448 RICH: {time.time()-t0:.1f}s", flush=True)

# ---- eval-side cost: Stabilizer at the envelope model scale ----
from pwstablenet_tpu.config import PipelineConfig  # noqa: E402
from pwstablenet_tpu.pipeline import Stabilizer  # noqa: E402

cfg = ModelConfig(model_resolution=(64, 64), num_levels=6,
                  base_features=32, max_features=256)
stab = Stabilizer(cfg, PipelineConfig(batch_windows=8))
u8 = np.clip((u + 1) * 127.5, 0, 255).round().astype(np.uint8)
t0 = time.time()
out, _ = stab.stabilize_frames(u8)
print(f"stabilize 48f 160x224 (64-res model): {time.time()-t0:.1f}s",
      flush=True)
