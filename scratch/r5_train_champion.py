"""Round-5 champion training: 61-pair rich dataset (DeepStab-sized,
with motion-blur + exposure-step stressors), champion recipe from
round 4 (b8, EMA 0.995, dropout, 1000 steps, lr decay from 50%),
PERSISTENT checkpoint dir so the champion weights survive for the
720p/1080p benchmark-resolution scoring (VERDICT r2 items 1+8).

Usage: r5_train_champion.py <data_root> <ckpt_dir> [steps] [seed]
"""
import json
import os
import sys

import numpy as np

from pwstablenet_tpu.config import (
    DataConfig, ModelConfig, PipelineConfig, TrainConfig,
)
from pwstablenet_tpu.data.deepstab import DeepStabDataset, batch_iterator
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip
from pwstablenet_tpu.eval import stability_report
from pwstablenet_tpu.eval.hooks import make_clip_eval_hook
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train import checkpoint as ckpt
from pwstablenet_tpu.train.loop import train
from pwstablenet_tpu.train.state import generator_params

root = sys.argv[1]
ckpt_dir = sys.argv[2]
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
SEED = int(sys.argv[4]) if len(sys.argv) > 4 else 0

model_cfg = ModelConfig(use_dropout=True)
train_cfg = TrainConfig(
    batch_size=8, num_epochs=1, steps_per_epoch=STEPS, w_feature=1.0,
    log_every=50, checkpoint_every=500, checkpoint_dir=ckpt_dir,
    ema_decay=0.995, eval_every=250, seed=SEED,
)
ds = DeepStabDataset(
    DataConfig(data_root=root, crop_size=(256, 256), num_decode_threads=4),
    model_cfg.temporal_window,
)
print(f"dataset: {len(ds.pairs)} pairs", flush=True)

# held-out eval clip from OUTSIDE the training seed range
stable, unstable = synthetic_pair_clip(32, 320, 448, seed=999,
                                       shake_px=7.0, **RICH)
clip_u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
state = train(
    model_cfg, train_cfg, batch_iterator(ds, train_cfg.batch_size, seed=SEED),
    resume=True,  # continue own checkpoints after a timeout/crash retry
    max_steps=STEPS,
    eval_fn=make_clip_eval_hook(model_cfg, clip_u8, stable_clip=stable,
                                batch_windows=8),
)
print("best:", json.dumps(ckpt.best_step(ckpt_dir)), flush=True)

# fresh-clip final scoring (the number that matters: never seen in
# training OR in best-step selection)
stable2, unstable2 = synthetic_pair_clip(48, 320, 448, seed=1234,
                                         shake_px=7.0, **RICH)
u8 = np.clip((unstable2 + 1) * 127.5, 0, 255).round().astype(np.uint8)
for label, params in (
    ("ema", generator_params(state)),
    ("best", ckpt.load_generator_params(ckpt_dir, step="best")),
):
    stab = Stabilizer(model_cfg, PipelineConfig(batch_windows=8),
                      params=params)
    out, _ = stab.stabilize_frames(u8)
    rep = stability_report(out.astype(np.float32) / 127.5 - 1.0, unstable2)
    print(f"EVAL[{label}]", json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
print("gt-stable ceiling:",
      round(stability_report(stable2)["stability_score"], 4), flush=True)
