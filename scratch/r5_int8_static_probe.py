"""Static-calibration int8 PTQ for the inference generator (VERDICT r2
item 5 — the named follow-up after round-4 dynamic quant lost 0.90x to
runtime absmax passes).

Scheme: per-conv input scales are PRECOMPUTED by a calibration pass
(eager, host-collected absmax over a few batches) and baked into the
jitted program as constants; kernels are pre-quantized per-output-
channel.  At runtime each conv is: quantize input (elementwise round/
clip/cast — fusable, no reduction) -> int8xint8->int32 MXU conv ->
dequantize+bias.  Heads stay f32 (zero-init, precision-sensitive).

Usage:
  scratch/tpu_run.sh 1200 scratch/r5_int8_static_probe.py
"""
import sys
import time
from contextlib import nullcontext

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import flax
import flax.linen as nn

from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.models import CascadedGenerator
from pwstablenet_tpu.utils.timing import device_time

cfg = ModelConfig()
h, w = cfg.model_resolution
rng = np.random.default_rng(0)

gen = CascadedGenerator(cfg)
x0 = jnp.zeros((1, h, w, cfg.stack_channels), jnp.float32)
params = flax.core.unfreeze(jax.jit(gen.init)(jax.random.PRNGKey(0), x0))
# nontrivial heads so flows are non-zero (zero-init by design)
for s in range(cfg.num_stages):
    head = params["params"][f"stage{s}"]["head"]
    head["kernel"] = jnp.asarray(
        rng.standard_normal(np.shape(head["kernel"])).astype(np.float32)
        * 0.03
    )

# ---------------- calibration: per-conv input absmax -----------------
scales = {}


def _path(context):
    return context.module.path


def calib_interceptor(next_fun, args, kwargs, context):
    if (
        isinstance(context.module, (nn.Conv, nn.ConvTranspose))
        and context.method_name == "__call__"
        and context.module.name in ("conv", "deconv")
    ):
        p = tuple(_path(context))
        s = float(jnp.max(jnp.abs(args[0])))
        scales[p] = max(scales.get(p, 0.0), s)
    return next_fun(*args, **kwargs)


calib_batches = [
    jnp.asarray(
        rng.uniform(-1, 1, (2, h, w, cfg.stack_channels)).astype(np.float32)
    )
    for _ in range(3)
]
t0 = time.perf_counter()
with nn.intercept_methods(calib_interceptor):
    for xb in calib_batches:
        gen.apply(params, xb)  # eager: absmax values are concrete
print(f"calibration: {len(scales)} convs in "
      f"{time.perf_counter()-t0:.1f}s", flush=True)

# -------------- pre-quantized kernels (per-out-channel) --------------
qkern = {}


def _prequantize(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            if k in ("conv", "deconv") and "kernel" in v:
                kern = np.asarray(v["kernel"], np.float32)  # HWIO
                skc = np.abs(kern).reshape(-1, kern.shape[-1]).max(0) / 127.0
                skc = np.maximum(skc, 1e-12).astype(np.float32)
                qkern[prefix + (k,)] = (
                    jnp.asarray(
                        np.clip(np.round(kern / skc), -127, 127).astype(
                            np.int8
                        )
                    ),
                    jnp.asarray(skc),
                )
            else:
                _prequantize(v, prefix + (k,))


_prequantize(params["params"])
print(f"prequantized {len(qkern)} kernels", flush=True)


def quant_interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if not (
        isinstance(mod, (nn.Conv, nn.ConvTranspose))
        and context.method_name == "__call__"
        and mod.name in ("conv", "deconv")
    ):
        return next_fun(*args, **kwargs)
    p = tuple(_path(context))
    sx = scales[p] / 127.0
    kq, skc = qkern[p]
    x = args[0]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(
        jnp.int8
    )
    if isinstance(mod, nn.Conv):  # DownBlock: 4x4 stride-2 pad (1,1)
        yq = jax.lax.conv_general_dilated(
            xq, kq, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    else:  # UpBlock: 4x4 stride-2 transpose, SAME
        yq = jax.lax.conv_transpose(
            xq, kq, strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    y = yq.astype(jnp.float32) * (sx * skc)
    bias = mod.variables["params"].get("bias")
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(jnp.dtype(cfg.compute_dtype))


def quant_apply(p, x):
    with nn.intercept_methods(quant_interceptor):
        return gen.apply(p, x)


# ------------------------- parity + timing ---------------------------
xb = jnp.asarray(
    rng.uniform(-1, 1, (16, h, w, cfg.stack_channels)).astype(np.float32)
)
f_fwd = jax.jit(lambda p, xx: gen.apply(p, xx)[-1])
q_fwd = jax.jit(lambda p, xx: quant_apply(p, xx)[-1])

ff = np.asarray(f_fwd(params, xb))
qf = np.asarray(q_fwd(params, xb))
err = float(np.abs(ff - qf).max())
sc = float(np.abs(ff).max())
print(f"flow parity: max abs err {err:.6f} (flow scale {sc:.4f}, "
      f"rel {err / max(sc, 1e-9):.4f})", flush=True)

dtf = device_time(lambda: f_fwd(params, xb), (), iters=10)
dtq = device_time(lambda: q_fwd(params, xb), (), iters=10)
print(f"generator fwd b16 256x256: bf16 {dtf*1e3:.2f} ms  "
      f"int8-static {dtq*1e3:.2f} ms  speedup {dtf/dtq:.2f}x", flush=True)
