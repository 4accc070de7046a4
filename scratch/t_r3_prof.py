"""Round-3 phase profile of the 720p chunk16 step (device-track times)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.ops.pixels import to_unit
from pwstablenet_tpu.ops.warp import warp_image
from pwstablenet_tpu.utils.timing import device_time

rng = np.random.default_rng(0)
model_cfg = ModelConfig()
n = 16
stab = Stabilizer(model_cfg, PipelineConfig(batch_windows=n))
T = model_cfg.temporal_window
mh, mw = model_cfg.model_resolution

H, W = 720, 1280
frames = jnp.asarray(
    rng.integers(0, 256, (n + T - 1, H, W, 3), np.uint8)
)
use_pallas = stab._pallas_ok(frames.shape)
print(f"pallas: {use_pallas}, T={T}, chunk={frames.shape}")

# full step
dt = device_time(
    lambda f: stab._chunk_step(stab.params, f, use_pallas), (frames,),
    iters=10,
)
print(f"full chunk16 step: {dt*1e3:.2f} ms  ({n/dt:.0f} fps)")


# phase 1: normalize + resize to model res
@jax.jit
def prep(f):
    ff = to_unit(f)
    return jax.image.resize(
        ff, (f.shape[0], mh, mw, 3), method="bilinear"
    )


dt1 = device_time(prep, (frames,), iters=10)
print(f"normalize+resize: {dt1*1e3:.2f} ms")

small = prep(frames)


# phase 2: temporal stack (on 256res)
@jax.jit
def stack(s):
    return jnp.concatenate([s[j : j + n] for j in range(T)], axis=-1)


dt2 = device_time(stack, (small,), iters=10)
print(f"temporal stack: {dt2*1e3:.2f} ms")

stacks = stack(small)

# phase 3: generator forward
gfwd = jax.jit(stab.model.apply)
dt3 = device_time(lambda p, x: gfwd(p, x), (stab.params, stacks), iters=10)
print(f"generator fwd (b{n}): {dt3*1e3:.2f} ms")

flows = gfwd(stab.params, stacks)
flow = flows[-1]

# phase 4: warp (incl flow resize) on uint8 centers
centers = frames[T // 2 : T // 2 + n]


def do_warp(c, fl):
    return warp_image(c, fl, padding_mode=model_cfg.padding_mode,
                      align_corners=model_cfg.align_corners,
                      use_pallas=use_pallas)


dt4 = device_time(do_warp, (centers, flow), iters=10)
print(f"flow-resize + packed warp: {dt4*1e3:.2f} ms")


# phase 4a: flow resize alone
@jax.jit
def fresize(fl):
    return jax.image.resize(fl, (n, H, W, 2), method="bilinear")


dt4a = device_time(fresize, (flow,), iters=10)
print(f"  flow resize alone: {dt4a*1e3:.2f} ms")

print(f"sum of phases: {(dt1+dt2+dt3+dt4)*1e3:.2f} ms vs full {dt*1e3:.2f}")
