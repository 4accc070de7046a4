"""Full-train-step A/B: decoder_impl deconv vs phase_conv (VERDICT r3
item 7 — the kernel-layout-copy bill).

The isolated-op probe (r7_deconv_probe.py) can mislead: the 8.3 ms of
copies in the round-3 profile come from the WHOLE step's interaction
of fwd + wgrad + dgrad kernel layouts.  This times the exact round-3
profiling configuration (default 8-level bf16 generator, b4 x
grad_accum 2, 256^2) and the b8 flat step, both impls, plus the
generator-only forward at inference batch 16.

  PYTHONPATH=/root/repo:$PYTHONPATH scratch/r7_tpu_run.sh 1800 scratch/r7_phase_step_probe.py
"""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.data import make_train_batch
from pwstablenet_tpu.models import CascadedGenerator
from pwstablenet_tpu.train import create_train_state, make_train_step
from pwstablenet_tpu.utils.timing import device_time

rng = np.random.default_rng(0)


def time_step(model_cfg, train_cfg, label):
    state, (gen, disc, feat) = create_train_state(
        model_cfg, train_cfg, jax.random.PRNGKey(0)
    )
    step = jax.jit(make_train_step(model_cfg, train_cfg, gen, disc, feat))
    batch = jax.tree_util.tree_map(
        jnp.asarray,
        make_train_batch(
            train_cfg.batch_size * train_cfg.grad_accum_steps, 256, 256,
            model_cfg.temporal_window, seed=1,
        ),
    )
    box = [state]

    def chained(b):
        box[0], m = step(box[0], b)
        return m

    t = device_time(chained, (batch,), iters=10)
    print(f"{label}: {t*1e3:.2f} ms/step", flush=True)
    return t


def time_fwd(model_cfg, label):
    gen = CascadedGenerator(model_cfg)
    h, w = model_cfg.model_resolution
    x = jnp.asarray(
        rng.standard_normal((16, h, w, model_cfg.stack_channels)),
        jnp.float32,
    )
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda p, x_: gen.apply(p, x_))
    t = device_time(fwd, (params, x), iters=20)
    print(f"{label}: {t*1e3:.2f} ms (b16 fwd)", flush=True)
    return t


for impl in ("deconv", "phase_conv"):
    mc = ModelConfig(decoder_impl=impl)
    time_fwd(mc, f"generator fwd [{impl}]")
    time_step(mc, TrainConfig(batch_size=4, grad_accum_steps=2),
              f"train b4xacc2 [{impl}]")
    time_step(mc, TrainConfig(batch_size=8),
              f"train b8 flat [{impl}]")

# numerical cross-check on device: same params, both impls
mc_d = ModelConfig(compute_dtype="float32")
mc_p = dataclasses.replace(mc_d, decoder_impl="phase_conv")
gen_d, gen_p = CascadedGenerator(mc_d), CascadedGenerator(mc_p)
h, w = mc_d.model_resolution
x = jnp.asarray(rng.standard_normal((2, h, w, mc_d.stack_channels)),
                jnp.float32)
params = jax.jit(gen_d.init)(jax.random.PRNGKey(1), x)
leaves, treedef = jax.tree_util.tree_flatten(params)
leaves = [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32)) * 0.05
          for l in leaves]
params = jax.tree_util.tree_unflatten(treedef, leaves)
f_d = np.asarray(jax.jit(gen_d.apply)(params, x)[1], np.float32)
f_p = np.asarray(jax.jit(gen_p.apply)(params, x)[1], np.float32)
print(f"on-device parity (f32 warped): max_abs "
      f"{np.abs(f_d - f_p).max():.3e}", flush=True)
