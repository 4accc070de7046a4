"""Round-2: actually TRAIN with use_dropout=True on the TPU (closing
VERDICT r1 item 2 — the round-1 attempt was killed during what looked
like a compile wedge; the probe shows compile is fine, so prove steps
execute and losses stay finite)."""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.data import make_train_batch
from pwstablenet_tpu.train import create_train_state, make_train_step

cfg = ModelConfig(use_dropout=True)  # flagship size + decoder dropout
tcfg = TrainConfig(batch_size=8, ema_decay=0.995)
print("devices:", jax.devices(), flush=True)
state, (gen, disc, feat) = create_train_state(cfg, tcfg, jax.random.PRNGKey(0))
step = jax.jit(make_train_step(cfg, tcfg, gen, disc, feat), donate_argnums=0)
batches = [
    jax.tree_util.tree_map(
        jnp.asarray, make_train_batch(8, 256, 256, cfg.temporal_window,
                                      seed=i, rich=(i % 2 == 0))
    )
    for i in range(3)
]
t0 = time.time()
for i in range(30):
    state, metrics = step(state, batches[i % 3])
    if (i + 1) % 10 == 0:
        scal = {k: round(float(v), 4) for k, v in metrics.items()}
        scal["step"] = i + 1
        scal["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(scal), flush=True)
assert all(
    jnp.isfinite(v).all() for v in jax.tree_util.tree_leaves(metrics)
)
print("DONE: 30 dropout training steps, losses finite", flush=True)
