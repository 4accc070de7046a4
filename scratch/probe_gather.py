"""Probe Pallas TPU gather support: take_along_axis along lanes & sublanes."""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

print("backend:", jax.default_backend())

# --- probe 1: gather along last (lane) axis, index varies per lane, same for all sublanes
def k_lane(x_ref, idx_ref, o_ref):
    x = x_ref[:]                      # (R, W)
    idx = idx_ref[:]                  # (R, P) int32
    o_ref[:] = jnp.take_along_axis(x, idx, axis=1)

R, W, P = 8, 256, 128
x = jnp.arange(R * W, dtype=jnp.float32).reshape(R, W)
idx = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None, :] * 2, (R, P))
try:
    out = pl.pallas_call(
        k_lane,
        out_shape=jax.ShapeDtypeStruct((R, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    print("lane-gather OK, max err", np.abs(np.asarray(out) - ref).max())
except Exception as e:
    print("lane-gather FAIL:", str(e)[:300])

# --- probe 2: gather along sublane axis (axis=0), index varies per lane
def k_sub(x_ref, idx_ref, o_ref):
    x = x_ref[:]                      # (R, P)
    idx = idx_ref[:]                  # (1, P) -> broadcast
    o_ref[:] = jnp.take_along_axis(x, idx, axis=0)

x2 = jnp.arange(R * P, dtype=jnp.float32).reshape(R, P)
idx2 = (jnp.arange(P, dtype=jnp.int32) % R)[None, :]
try:
    out = pl.pallas_call(
        k_sub,
        out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2, idx2)
    ref = np.take_along_axis(np.asarray(x2), np.asarray(idx2), axis=0)
    print("sublane-gather OK, max err", np.abs(np.asarray(out) - ref).max())
except Exception as e:
    print("sublane-gather FAIL:", str(e)[:300])

# --- probe 3: full-depth sublane gather, out same shape as x
def k_sub2(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

idx3 = jnp.broadcast_to((jnp.arange(P, dtype=jnp.int32) % R)[None, :], (R, P))
try:
    out = pl.pallas_call(
        k_sub2,
        out_shape=jax.ShapeDtypeStruct((R, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2, idx3)
    ref = np.take_along_axis(np.asarray(x2), np.asarray(idx3), axis=0)
    print("sublane-gather-full OK, max err", np.abs(np.asarray(out) - ref).max())
except Exception as e:
    print("sublane-gather-full FAIL:", str(e)[:300])
