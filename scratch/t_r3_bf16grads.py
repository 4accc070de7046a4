"""Probe: conv-kernel layout copies under autodiff — f32 params vs
params pre-cast to bf16 (master-weights style).  Measures generator
value-and-grad only (where the 4x4x1536x512 layout transposes live).
NOT integrated; gradient numerics would change (one bf16 rounding)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.models import CascadedGenerator
from pwstablenet_tpu.utils.timing import device_time

cfg = ModelConfig()
model = CascadedGenerator(cfg)
h, w = cfg.model_resolution
rng = np.random.default_rng(0)
x = jnp.asarray(
    rng.standard_normal((8, h, w, cfg.stack_channels)).astype(np.float32)
)
params = jax.jit(model.init)(jax.random.PRNGKey(0), x)


def loss(p, xin):
    flows = model.apply(p, xin)
    return sum(jnp.sum(jnp.square(f)) for f in flows)


vg = jax.jit(jax.value_and_grad(loss))
dt0 = device_time(lambda: vg(params, x), (), iters=8)
print(f"f32-param value_and_grad (b8):      {dt0*1e3:.2f} ms")

cast = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16)
    if (a.dtype == jnp.float32 and a.ndim == 4)
    else a,
    params,
)


def loss_cast(p32, xin):
    pb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if (a.dtype == jnp.float32 and a.ndim == 4)
        else a,
        p32,
    )
    flows = model.apply(pb, xin)
    return sum(jnp.sum(jnp.square(f)) for f in flows)


vg2 = jax.jit(jax.value_and_grad(loss_cast))
dt1 = device_time(lambda: vg2(params, x), (), iters=8)
print(f"bf16-cast-param value_and_grad:     {dt1*1e3:.2f} ms "
      f"({(dt0-dt1)*1e3:+.2f} ms)")

# sanity: gradient error introduced by the cast
g0 = vg(params, x)[1]
g1 = vg2(params, x)[1]
errs = jax.tree_util.tree_map(
    lambda a, b: float(
        jnp.max(jnp.abs(a - b) / (jnp.abs(a) + 1e-6))
    ),
    g0, g1,
)
print("max relative grad error:",
      max(jax.tree_util.tree_leaves(errs)))
