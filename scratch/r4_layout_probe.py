"""Round-2 probe (VERDICT r1 item 4): attack the 1.9 GB/step of f32
conv-kernel layout transposes with XLA AUTO input layouts.

Round-3 finding: the train-step profile shows ~8.3 ms/step of XLA copy
ops — layout transposes of the big decoder conv kernels (e.g.
4x4x1536x512), re-done every step because jitted functions default to
row-major ("default") layouts for inputs.  bf16 pre-cast changed
nothing (XLA casts before transposing).

This probe compiles the SAME generator value_and_grad with
``Format(Layout.AUTO)`` on the params argument, letting XLA choose the
input layout (ideally the conv-friendly one, hoisting the transpose out
of the step entirely), re-lays the params with device_put to the chosen
layouts, and compares device time.

  scratch/tpu_run.sh 1200 scratch/r4_layout_probe.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.layout import Format, Layout

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


# ---- baseline: default layouts --------------------------------------
vg = jax.jit(jax.value_and_grad(loss))
dt0 = device_time(lambda: vg(params, x), (), iters=8)
print(f"default-layout value_and_grad (b8): {dt0*1e3:.2f} ms", flush=True)

# ---- AUTO layouts: XLA picks the param layout ------------------------
auto = Format(Layout.AUTO)
vg_auto = jax.jit(
    jax.value_and_grad(loss), in_shardings=(auto, auto), out_shardings=None
)
lowered = vg_auto.lower(params, x)
compiled = lowered.compile()
in_fmts = compiled.input_formats
# relay the params into the chosen layouts
params_l = jax.device_put(params, in_fmts[0][0])
x_l = jax.device_put(x, in_fmts[0][1])

# count how many param leaves got a non-default layout
leaves_def = jax.tree_util.tree_leaves(in_fmts[0][0])
n_custom = 0
for fmt in leaves_def:
    try:
        if "default" not in str(fmt).lower():
            n_custom += 1
    except Exception:
        pass
print(f"param leaves with custom layout: {n_custom}/"
      f"{len(leaves_def)}", flush=True)

dt1 = device_time(lambda: compiled(params_l, x_l), (), iters=8)
print(f"AUTO-layout value_and_grad:         {dt1*1e3:.2f} ms "
      f"({(dt0-dt1)*1e3:+.2f} ms vs default)", flush=True)

# numerics check
v0, g0 = vg(params, x)
v1, g1 = compiled(params_l, x_l)
err = max(
    float(jnp.max(jnp.abs(a - b)))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1))
)
print(f"value diff: {float(jnp.abs(v0 - v1)):.3e}  "
      f"max grad diff: {err:.3e}", flush=True)

# ---- forward-only (inference path) -----------------------------------
fwd = jax.jit(lambda p, xin: model.apply(p, xin)[-1])
dtf0 = device_time(lambda: fwd(params, x), (), iters=8)
print(f"default-layout fwd (b8):            {dtf0*1e3:.2f} ms", flush=True)
fwd_auto = jax.jit(
    lambda p, xin: model.apply(p, xin)[-1], in_shardings=(auto, auto)
)
fcompiled = fwd_auto.lower(params, x).compile()
fin = fcompiled.input_formats
fparams_l = jax.device_put(params, fin[0][0])
fx_l = jax.device_put(x, fin[0][1])
dtf1 = device_time(lambda: fcompiled(fparams_l, fx_l), (), iters=8)
print(f"AUTO-layout fwd:                    {dtf1*1e3:.2f} ms "
      f"({(dtf0-dtf1)*1e3:+.2f} ms)", flush=True)
print("DONE", flush=True)
