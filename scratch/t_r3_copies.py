"""Which tensors do the train step's XLA copies move? (HLO inspection)"""
import collections
import re
import sys

import jax

sys.path.insert(0, "/root/repo")

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.data import make_train_batch
from pwstablenet_tpu.parallel import (
    data_parallel_step, make_mesh_for_batch, replicate_tree, shard_batch,
)
from pwstablenet_tpu.train import create_train_state, make_train_step

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

txt = dp_step.lower(state, batch).compile().as_text()


def shape_bytes(shape):
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    size = {"f32": 4, "bf16": 2, "s32": 4, "u8": 1, "pred": 1,
            "u32": 4, "f16": 2, "s8": 1}.get(dt, 4)
    return n * size


copies = collections.Counter()
counts = collections.Counter()
for line in txt.splitlines():
    m = re.search(r"=\s+(\S+)\s+copy\(", line)
    if m:
        shape = m.group(1)
        copies[shape] += shape_bytes(shape)
        counts[shape] += 1

total = sum(copies.values())
print(f"total copy instructions: {sum(counts.values())}, "
      f"total bytes: {total/1e6:.1f} MB")
for shape, b in copies.most_common(25):
    print(f"  {counts[shape]:4d}x  {shape:40s}  {b/1e6:8.2f} MB")
