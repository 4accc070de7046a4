import jax, jax.numpy as jnp, traceback
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

R, W, P = 8, 256, 128

# lane gather with full-shape idx
def k_lane(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)
x = jnp.arange(R * W, dtype=jnp.float32).reshape(R, W)
idx = jnp.broadcast_to((jnp.arange(W, dtype=jnp.int32) * 7 % W)[None, :], (R, W))
try:
    out = pl.pallas_call(
        k_lane,
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    print("lane-gather-full OK, max err", np.abs(np.asarray(out) - ref).max())
except Exception as e:
    print("lane-gather-full FAIL:")
    traceback.print_exc(limit=2)

# sublane gather with larger sublane count (e.g. 64 rows)
R2 = 64
def k_sub(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)
x2 = jnp.arange(R2 * W, dtype=jnp.float32).reshape(R2, W)
idx2 = jnp.broadcast_to((jnp.arange(W, dtype=jnp.int32) % R2)[None, :], (R2, W))
try:
    out = pl.pallas_call(
        k_sub,
        out_shape=jax.ShapeDtypeStruct((R2, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2, idx2)
    ref = np.take_along_axis(np.asarray(x2), np.asarray(idx2), axis=0)
    print(f"sublane-gather R={R2} OK, max err", np.abs(np.asarray(out) - ref).max())
except Exception as e:
    print(f"sublane-gather R={R2} FAIL:")
    traceback.print_exc(limit=2)
