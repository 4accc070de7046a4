import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((8, 128), np.float32))
idx = jnp.asarray(rng.integers(0, 128, (8, 128)), dtype=jnp.int32)
out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x, idx)
ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
err = np.abs(np.asarray(out) - ref)
print("lane-gather (8,128): max err", err.max())
if err.max() > 0:
    # check hypothesis: gather is per-sublane-0 row? or column-major?
    b = np.asarray(out)
    alt = np.asarray(x)[np.arange(8)[:,None], np.asarray(idx)]  # same as ref
    # maybe it gathered along sublanes instead?
    alt2 = np.take_along_axis(np.asarray(x), np.asarray(idx) % 8, axis=0)
    print("matches sublane-gather?", np.allclose(b, alt2))
    print("sample out[0,:6]", b[0,:6], "ref[0,:6]", ref[0,:6])
