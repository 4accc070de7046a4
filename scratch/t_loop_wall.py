"""Measure train() hot-loop wall overhead vs device step time on the TPU.

VERDICT round-1 item 2 'done' criterion: wall sec/step within ~1.2x of
device train_step_ms over a >=100-step run.  One train() call; compile
lands in the first log window, steady-state wall sec/step is read from
the later log_every windows.
"""
import json

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.train.loop import synthetic_batch_iterator, train

model_cfg = ModelConfig()
train_cfg = TrainConfig(
    batch_size=4,
    log_every=20,
    checkpoint_every=10**9,
    checkpoint_dir="/tmp/loopwall_ckpt",
)

logs = []
it = synthetic_batch_iterator(model_cfg, train_cfg)
train(model_cfg, train_cfg, it, max_steps=122, log_fn=logs.append)

steady = [m["sec_per_step"] for m in logs[1:]]  # drop compile window
print("LOOPWALL " + json.dumps({
    "steps": logs[-1]["step"],
    "steady_wall_ms_per_step": [round(s * 1e3, 2) for s in steady],
    "best_ms": round(min(steady) * 1e3, 2),
}), flush=True)
