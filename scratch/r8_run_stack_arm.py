"""Stacked-recipe arm: ALL three measured-positive levers at once.

Round-5 capstone — the matrix measured each lever alone; this arm
answers the question a user of the framework actually has: does the
full robust recipe STACK?

  - hard curriculum data at 2x scale (r8_gen_stack_data.py)
  - pixel_loss_mode = mean_matched (the measured requirement for
    curriculum data containing exposure steps)
  - resize_scale_range = (0.3, 1.0) multi-scale downscale jitter

Everything else is the champion CPU-envelope protocol (64^2 lvl6
base32, b4, EMA 0.995, eval hook, best-step).  The paired comparison
partner is r8_hard_mm (hard + mean_matched at base scale): the two
arms differ in EXACTLY the multi-scale lever, on the same worlds.

Usage: r8_run_stack_arm.py <data_root> <ckpt_dir> [steps] [seed]
"""
import json
import sys

import numpy as np

from pwstablenet_tpu.config import (
    DataConfig, ModelConfig, PipelineConfig, TrainConfig,
)
from pwstablenet_tpu.data.deepstab import DeepStabDataset, batch_iterator
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip
from pwstablenet_tpu.eval import stability_report
from pwstablenet_tpu.eval.metrics import psnr
from pwstablenet_tpu.eval.hooks import make_clip_eval_hook
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train import checkpoint as ckpt
from pwstablenet_tpu.train.loop import train
from pwstablenet_tpu.train.state import generator_params

root, ckpt_dir = sys.argv[1], sys.argv[2]
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 500
SEED = int(sys.argv[4]) if len(sys.argv) > 4 else 0

model_cfg = ModelConfig(
    model_resolution=(64, 64), num_levels=6,
    base_features=32, max_features=256, use_dropout=True,
)
train_cfg = TrainConfig(
    batch_size=4, num_epochs=1, steps_per_epoch=STEPS, w_feature=1.0,
    pixel_loss_mode="mean_matched",
    log_every=25, checkpoint_every=250, checkpoint_dir=ckpt_dir,
    ema_decay=0.995, eval_every=100, seed=SEED,
)
ds = DeepStabDataset(
    DataConfig(data_root=root, crop_size=(64, 64), num_decode_threads=2,
               resize_scale_range=(0.3, 1.0)),
    model_cfg.temporal_window,
)
print(f"arm=stack data={root} seed={SEED} steps={STEPS} "
      f"pairs={len(ds.pairs)}", flush=True)

# eval hook: the ms arm's held-out clip (2x scale, shake 7 = in-range)
stable, unstable = synthetic_pair_clip(
    32, 320, 448, seed=999, shake_px=7.0, texture_detail_px=4.0, **RICH)
clip_u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
state = train(
    model_cfg, train_cfg, batch_iterator(ds, train_cfg.batch_size, seed=SEED),
    resume=True,
    max_steps=STEPS,
    eval_fn=make_clip_eval_hook(model_cfg, clip_u8, stable_clip=stable,
                                batch_windows=8),
)
print("best:", json.dumps(ckpt.best_step(ckpt_dir)), flush=True)

# own-protocol fresh-clip report (cross-arm comparison: r8_score_ms.py
# against r8_hard_mm)
stable2, unstable2 = synthetic_pair_clip(
    48, 320, 448, seed=1234, shake_px=7.0, texture_detail_px=4.0, **RICH)
u8 = np.clip((unstable2 + 1) * 127.5, 0, 255).round().astype(np.uint8)
for label, params in (
    ("ema", generator_params(state)),
    ("best", ckpt.load_generator_params(ckpt_dir, step="best")),
):
    stab = Stabilizer(model_cfg, PipelineConfig(batch_windows=8),
                      params=params)
    out, _ = stab.stabilize_frames(u8)
    outf = out.astype(np.float32) / 127.5 - 1.0
    rep = stability_report(outf, unstable2)
    rep["psnr_vs_gt"] = psnr(outf, stable2)
    print(f"EVAL[{label}]", json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
print("gt-stable ceiling:",
      round(stability_report(stable2)["stability_score"], 4), flush=True)
