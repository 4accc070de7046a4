"""Per-op profile of the 720p pipeline chunk step."""
import glob, gzip, json, tempfile
from collections import defaultdict
import numpy as np
import jax, jax.numpy as jnp
from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.pipeline import Stabilizer

rng = np.random.default_rng(0)
stab = Stabilizer(ModelConfig(), PipelineConfig(batch_windows=8))
frames = jnp.asarray((rng.random((14, 720, 1280, 3)) * 255).astype(np.uint8))
up = stab._pallas_ok(frames.shape)
step = stab._chunk_step
out = step(stab.params, frames, up); jax.block_until_ready(out)

td = tempfile.mkdtemp()
jax.profiler.start_trace(td, create_perfetto_trace=True)
for _ in range(5):
    out = step(stab.params, frames, up)
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
total = sum(ops.values())
print(f"total XLA-op time {total/5e3:.2f} ms/iter, {len(ops)} names")
for n, d in sorted(ops.items(), key=lambda kv: -kv[1])[:25]:
    print(f"  {d/5e3:8.3f} ms  {n[:100]}")
