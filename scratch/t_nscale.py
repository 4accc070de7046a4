"""fps vs batch_windows; generator op profile."""
import glob, gzip, json, tempfile
from collections import defaultdict
import numpy as np, jax, jax.numpy as jnp
from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.utils.timing import device_time

rng = np.random.default_rng(0)
for n in (8, 16, 32):
    stab = Stabilizer(ModelConfig(), PipelineConfig(batch_windows=n))
    T = stab.model_cfg.temporal_window
    frames = jnp.asarray(rng.integers(0, 256, (n + T - 1, 720, 1280, 3), np.uint8))
    up = stab._pallas_ok(frames.shape)
    dt = device_time(lambda f, s=stab, u=up: s._chunk_step(s.params, f, u),
                     (frames,), iters=8)
    print(f"n={n}: {dt*1e3:.2f} ms/chunk = {n/dt:.0f} fps (pallas {up})")

# generator profile at b8
stab = Stabilizer(ModelConfig(), PipelineConfig(batch_windows=8))
x = jnp.asarray(rng.standard_normal((8, 256, 256, 21)).astype(np.float32))
fwd = jax.jit(stab.model.apply)
out = fwd(stab.params, x); jax.block_until_ready(out)
td = tempfile.mkdtemp()
jax.profiler.start_trace(td, create_perfetto_trace=True)
for _ in range(5):
    out = fwd(stab.params, x)
jax.block_until_ready(out)
jax.profiler.stop_trace()
f = sorted(glob.glob(td + "/**/perfetto_trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(f))["traceEvents"]
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        names[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
ops = defaultdict(float)
for e in ev:
    if e.get("ph") == "X" and names.get((e.get("pid"), e.get("tid"))) == "XLA Ops":
        ops[e.get("name", "?")] += e.get("dur", 0)
print(f"gen total {sum(ops.values())/5e3:.2f} ms/iter")
for nm, d in sorted(ops.items(), key=lambda kv: -kv[1])[:18]:
    print(f"  {d/5e3:7.3f} ms  {nm[:90]}")
