"""Per-op device profile of the adversarial train step (b4x2 256²)."""
import glob
import gzip
import json
import sys
import tempfile

import numpy as np
import jax

sys.path.insert(0, "/root/repo")

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.data import make_train_batch
from pwstablenet_tpu.parallel import (
    data_parallel_step, make_mesh_for_batch, replicate_tree, shard_batch,
)
from pwstablenet_tpu.train import create_train_state, make_train_step


def op_totals(td):
    files = glob.glob(td + "/**/perfetto_trace.json.gz", recursive=True)
    events = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
    device_pids = {
        e.get("pid")
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "/device:" in str(e.get("args", {}).get("name", ""))
    }
    threads = {}
    for e in events:
        if (
            e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("pid") in device_pids
        ):
            threads[(e["pid"], e["tid"])] = e["args"]["name"]
    totals = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            tname = threads.get((e.get("pid"), e.get("tid")))
            if tname and "Ops" in tname:
                key = e.get("name", "?")
                totals[key] = totals.get(key, 0.0) + e["dur"] / 1e3
    return totals


model_cfg = ModelConfig()
train_cfg = TrainConfig(batch_size=4)
mesh = make_mesh_for_batch(train_cfg.batch_size)
state, (gen, disc, feat) = create_train_state(
    model_cfg, train_cfg, jax.random.PRNGKey(0)
)
dp_step = data_parallel_step(
    make_train_step(model_cfg, train_cfg, gen, disc, feat), mesh
)
state = replicate_tree(state, mesh)
batch = shard_batch(
    make_train_batch(4, 256, 256, model_cfg.temporal_window), mesh
)

box = [state]
for _ in range(3):
    box[0], metrics = dp_step(box[0], batch)
jax.block_until_ready(metrics)

iters = 10
with tempfile.TemporaryDirectory() as td:
    jax.profiler.start_trace(td, create_perfetto_trace=True)
    for _ in range(iters):
        box[0], metrics = dp_step(box[0], batch)
    jax.block_until_ready(metrics)
    jax.profiler.stop_trace()
    totals = op_totals(td)

print("==== train step b4x2 256x256 (per step, ms) ====")
groups = {}
for name, ms in totals.items():
    base = name.split(".")[0]
    groups[base] = groups.get(base, 0.0) + ms
for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:30]:
    print(f"  {ms/iters:8.3f}  {name[:90]}")
print(f"  total: {sum(totals.values())/iters:.2f} ms")
print("\n==== grouped by op family ====")
for name, ms in sorted(groups.items(), key=lambda kv: -kv[1])[:20]:
    print(f"  {ms/iters:8.3f}  {name[:90]}")
