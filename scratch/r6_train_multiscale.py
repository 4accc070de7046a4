"""STAGED for round 6: multi-scale champion training.

Round-5 measured chain that motivates this:
1. At-resolution scoring: residual jitter is ~0.5-0.7% of frame width
   at every resolution (720p 7.5 px, 1080p 13.7 px).
2. Zero-shot model_resolution=512 with 256-trained params is
   quality-NEUTRAL at 4x flops (r5_modelres512_probe) — the bound is
   the model's learned accuracy at its training statistics, not flow
   resolution.
=> The lever is TRAINING statistics: crops from CLIPS WITH
resolution-absolute fine texture, downscale-augmented so the model
sees exactly what high-resolution inference feeds it (a washed
antialiased downscale of fine-textured content).

Recipe: 61-pair stressed dataset generated at 640x896 with
texture_detail_px=8, trained with resize_scale_range=(0.3, 1.0)
(INTER_AREA downscale jitter before the 256 crop) — otherwise the
round-5 champion recipe. Score with r5_score_benchres.py afterwards
and compare the 720p/1080p jitter rows.

Usage: r6_train_multiscale.py <data_root> <ckpt_dir> [steps] [seed]
(data generated on first run if absent; ~45 min of CPU synthesis at
640x896 — start it before grabbing the TPU)
"""
import json
import os
import sys

import numpy as np

from pwstablenet_tpu.config import (
    DataConfig, ModelConfig, PipelineConfig, TrainConfig,
)
from pwstablenet_tpu.data import video_io
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
H, W = 640, 896  # 2x the round-5 data; fine texture at native scale

if not os.path.isdir(root):
    rng = np.random.default_rng(5)
    os.makedirs(os.path.join(root, "stable"), exist_ok=True)
    os.makedirs(os.path.join(root, "unstable"), exist_ok=True)
    for i in range(61):
        kw = dict(RICH, texture_detail_px=8.0)
        scale = H / 320.0
        kw["shake_px"] = float(rng.uniform(3.0, 9.0)) * scale
        kw["pan_px"] = float(rng.uniform(0.3, 1.8)) * scale
        s, u = synthetic_pair_clip(80, H, W, seed=5 + i, **kw)
        video_io.write_video(os.path.join(root, "stable", f"{i:02d}.avi"),
                             s, 30.0, "MJPG")
        video_io.write_video(os.path.join(root, "unstable", f"{i:02d}.avi"),
                             u, 30.0, "MJPG")
        print(f"pair {i:02d} written", flush=True)

model_cfg = ModelConfig(use_dropout=True)
train_cfg = TrainConfig(
    batch_size=8, num_epochs=1, steps_per_epoch=STEPS, w_feature=1.0,
    log_every=50, checkpoint_every=500, checkpoint_dir=ckpt_dir,
    ema_decay=0.995, eval_every=250, seed=SEED,
)
ds = DeepStabDataset(
    DataConfig(data_root=root, crop_size=(256, 256),
               resize_scale_range=(0.3, 1.0),  # the multi-scale lever
               num_decode_threads=4),
    model_cfg.temporal_window,
)
print(f"dataset: {len(ds.pairs)} pairs at {H}x{W}", flush=True)

stable, unstable = synthetic_pair_clip(
    32, H, W, seed=999, shake_px=7.0 * H / 320.0,
    texture_detail_px=8.0, **RICH
)
clip_u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
state = train(
    model_cfg, train_cfg, batch_iterator(ds, train_cfg.batch_size, seed=SEED),
    resume=True,  # continue own checkpoints after a timeout/crash retry
    max_steps=STEPS,
    eval_fn=make_clip_eval_hook(model_cfg, clip_u8, stable_clip=stable,
                                batch_windows=8),
)
print("best:", json.dumps(ckpt.best_step(ckpt_dir)), flush=True)

# fresh-clip scoring at the TRAINING-NATIVE resolution
stable2, unstable2 = synthetic_pair_clip(
    48, H, W, seed=1234, shake_px=7.0 * H / 320.0,
    texture_detail_px=8.0, **RICH
)
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
print("gt-stable ceiling:", json.dumps({
    k: round(float(v), 4)
    for k, v in stability_report(stable2).items()}), flush=True)
