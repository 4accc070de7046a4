"""Round-2 decisive micro-probe for the int8-inference idea (VERDICT r1
item 9): is a representative UNet conv even faster in int8 on v5e?

v5e MXU does int8 at 2x bf16 peak, but the generator is bounded by
small deep-level spatial dims (24% MFU), so the question is whether
int8 helps at THESE shapes.  Measures the three outermost encoder convs
(where the flops are) in bf16 vs int8 (int8 operands ->
preferred_element_type=int32).  If int8 is not clearly faster here, the
whole int8-inference direction is dead and gets recorded as such.

  scratch/tpu_run.sh 900 scratch/r4_int8_conv_probe.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from pwstablenet_tpu.utils.timing import device_time

rng = np.random.default_rng(0)
# (batch, h, w, cin, cout) for the flop-heavy outer levels at b16
CASES = [
    (16, 256, 256, 21, 64),    # stack -> level 0
    (16, 128, 128, 64, 128),   # level 0 -> 1
    (16, 64, 64, 128, 256),    # level 1 -> 2
    (16, 32, 32, 256, 512),    # level 2 -> 3
]

for (b, h, w, cin, cout) in CASES:
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((4, 4, cin, cout)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (b, h, w, cin)), jnp.int8)
    ki = jnp.asarray(rng.integers(-127, 127, (4, 4, cin, cout)), jnp.int8)

    def conv(xx, kk, pref):
        return jax.lax.conv_general_dilated(
            xx, kk, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pref,
        )

    fb = jax.jit(lambda xx, kk: conv(xx, kk, jnp.float32))
    fi = jax.jit(lambda xx, kk: conv(xx, kk, jnp.int32))
    try:
        dtb = device_time(lambda: fb(x, k), (), iters=10)
        dti = device_time(lambda: fi(xi, ki), (), iters=10)
        flops = 2 * b * (h // 2) * (w // 2) * cout * 16 * cin
        print(
            f"{b}x{h}x{w} {cin}->{cout}: bf16 {dtb*1e3:.3f} ms "
            f"({flops/dtb/1e12:.1f} TF/s)  int8 {dti*1e3:.3f} ms "
            f"({flops/dti/1e12:.1f} TOP/s)  speedup {dtb/dti:.2f}x",
            flush=True,
        )
    except Exception as e:
        print(f"{b}x{h}x{w} {cin}->{cout}: FAILED {type(e).__name__}: {e}",
              flush=True)
print("DONE", flush=True)
