"""Resume the 1000-step checkpoint and continue to 2500 steps
(exercises --resume end to end on TPU; cumulative quality push)."""
import json
import time

import numpy as np

from pwstablenet_tpu.config import (
    DataConfig, ModelConfig, PipelineConfig, TrainConfig,
)
from pwstablenet_tpu.data.deepstab import DeepStabDataset, batch_iterator
from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
from pwstablenet_tpu.eval import stability_report
from pwstablenet_tpu.eval.hooks import make_clip_eval_hook
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train.loop import train
from pwstablenet_tpu.train.state import generator_params

root = "/tmp/deepstab_r3long"
STEPS = 2500
model_cfg = ModelConfig()
train_cfg = TrainConfig(
    batch_size=8, num_epochs=1, steps_per_epoch=STEPS, w_feature=1.0,
    log_every=100, checkpoint_every=500,
    checkpoint_dir="/tmp/deepstab_r3long_ckpt",
    ema_decay=0.995, eval_every=500,
    tb_log_dir="/tmp/deepstab_r3long_tb",
)
data_cfg = DataConfig(data_root=root, crop_size=(256, 256),
                      num_decode_threads=4)
ds = DeepStabDataset(data_cfg, model_cfg.temporal_window)
it = batch_iterator(ds, train_cfg.batch_size, seed=1)

stable, unstable = synthetic_pair_clip(32, 320, 448, seed=999, shake_px=7.0)
clip_u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
hook = make_clip_eval_hook(
    model_cfg, clip_u8, stable_clip=stable, batch_windows=8
)

t0 = time.time()
state = train(model_cfg, train_cfg, it, max_steps=STEPS, resume=True,
              log_fn=lambda m: print(json.dumps(m), flush=True),
              eval_fn=hook)
print(f"resumed to step {int(state.step)} in {time.time()-t0:.0f}s",
      flush=True)

stable2, unstable2 = synthetic_pair_clip(48, 320, 448, seed=1234,
                                         shake_px=7.0)
clip2 = np.clip((unstable2 + 1) * 127.5, 0, 255).round().astype(np.uint8)
for label, params in (
    ("raw", generator_params(state, prefer_ema=False)),
    ("ema", generator_params(state)),
):
    stab = Stabilizer(model_cfg, PipelineConfig(batch_windows=8),
                      params=params)
    out, _ = stab.stabilize_frames(clip2)
    out_f = out.astype(np.float32) / 127.5 - 1.0
    rep = stability_report(out_f, unstable2)
    print(f"EVAL[{label}] " + json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
print("unstable baseline:", round(stability_report(unstable2)
      ["stability_score"], 4),
      "gt:", round(stability_report(stable2)["stability_score"], 4),
      flush=True)
print("DONE", flush=True)
