"""Profile generator per-op device times; identify hot fusions."""
import glob, gzip, json, re, tempfile
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
compiled = fwd.lower(params, x).compile()
hlo = compiled.as_text()
out = fwd(params, x); jax.block_until_ready(out)

td = tempfile.mkdtemp()
jax.profiler.start_trace(td, create_perfetto_trace=True)
for _ in range(5):
    out = fwd(params, x)
jax.block_until_ready(out)
jax.profiler.stop_trace()

f = sorted(glob.glob(td + "/**/perfetto_trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(f))["traceEvents"]
# device "XLA Ops" track
names = {}
for e in ev:
    if e.get("ph") == "M":
        names[(e.get("pid"), e.get("tid"))] = e.get("args", {}).get("name")
op_tids = {k for k, v in names.items() if v == "XLA Ops"}
dur = defaultdict(float)
for e in ev:
    if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
        dur[e.get("name", "?")] += e.get("dur", 0)
top = sorted(dur.items(), key=lambda kv: -kv[1])[:12]
total = sum(dur.values())
print(f"total op time {total/5e3:.2f} ms/iter", flush=True)
for name, d in top:
    print(f"{d/5e3:7.2f} ms/iter  {name[:70]}")
    # find this op in HLO
    m = re.search(rf"^\s*%?{re.escape(name)}\S* = ([^\n]{{0,160}})", hlo, re.M)
    if m:
        print(f"          {m.group(1)[:150]}")
print("DONE")
