import glob, gzip, json, tempfile
import jax, jax.numpy as jnp, numpy as np
from collections import defaultdict
from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.models import CascadedGenerator

cfg = ModelConfig()
model = CascadedGenerator(cfg)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((8, 256, 256, cfg.stack_channels)).astype(np.float32))
params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
fwd = jax.jit(model.apply)
out = fwd(params, x); jax.block_until_ready(out)

td = tempfile.mkdtemp()
jax.profiler.start_trace(td, create_perfetto_trace=True)
for _ in range(5):
    out = fwd(params, x)
jax.block_until_ready(out)
jax.profiler.stop_trace()

f = sorted(glob.glob(td + "/**/perfetto_trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(f))["traceEvents"]
tracks = defaultdict(lambda: defaultdict(float))
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        names[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
for e in ev:
    if e.get("ph") == "X":
        key = names.get((e.get("pid"), e.get("tid")), f"{e.get('pid')}/{e.get('tid')}")
        tracks[key][e.get("name", "?")] += e.get("dur", 0)
for track, ops in tracks.items():
    total = sum(ops.values())
    print(f"== {track}: {total/5e3:.2f} ms/iter over {len(ops)} op names")
    for n, d in sorted(ops.items(), key=lambda kv: -kv[1])[:8]:
        print(f"   {d/5e3:8.2f} ms  {n[:80]}")
print("DONE")
