"""High-pan temporal-mode A/B (VERDICT r2 item 2).

The compensated temporal loss exists to not fight legitimate pans; the
round-4 A/B ran on ~1 px/frame GT pan where both forms coincide.  This
dataset pans 4-8 px/frame so the raw form |out_t - out_{t+1}| must
penalize the GT motion itself, while |Δout - Δgt| doesn't.

Usage: r5_highpan_ab.py <workdir> <raw|compensated> [seed] [steps]
Writes the dataset once (shared across arms), trains one arm, prints
fresh-clip metrics.
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
from pwstablenet_tpu.eval.metrics import psnr
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train import checkpoint as ckpt
from pwstablenet_tpu.train.loop import train
from pwstablenet_tpu.train.state import generator_params
from pwstablenet_tpu.eval.hooks import make_clip_eval_hook

work = sys.argv[1]
mode = sys.argv[2]
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 0
STEPS = int(sys.argv[4]) if len(sys.argv) > 4 else 1000
root = os.path.join(work, "data_highpan")

if not os.path.isdir(root):
    rng = np.random.default_rng(5)
    os.makedirs(os.path.join(root, "stable"), exist_ok=True)
    os.makedirs(os.path.join(root, "unstable"), exist_ok=True)
    for i in range(12):
        kw = dict(RICH)
        kw["shake_px"] = float(rng.uniform(3.0, 9.0))
        kw["pan_px"] = float(rng.uniform(4.0, 8.0))  # HIGH pan
        s, u = synthetic_pair_clip(80, 320, 448, seed=5 + i, **kw)
        video_io.write_video(os.path.join(root, "stable", f"{i:02d}.avi"),
                             s, 30.0, "MJPG")
        video_io.write_video(os.path.join(root, "unstable", f"{i:02d}.avi"),
                             u, 30.0, "MJPG")
    print("dataset written", flush=True)

ckpt_dir = os.path.join(work, f"ckpt_{mode}_s{SEED}")
model_cfg = ModelConfig(use_dropout=True)
train_cfg = TrainConfig(
    batch_size=8, num_epochs=1, steps_per_epoch=STEPS, w_feature=1.0,
    log_every=100, checkpoint_every=STEPS, checkpoint_dir=ckpt_dir,
    ema_decay=0.995, eval_every=250, seed=SEED, temporal_mode=mode,
)
ds = DeepStabDataset(
    DataConfig(data_root=root, crop_size=(256, 256), num_decode_threads=4),
    model_cfg.temporal_window,
)
stable, unstable = synthetic_pair_clip(32, 320, 448, seed=999,
                                       shake_px=7.0, pan_px=6.0, **RICH)
clip_u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
state = train(
    model_cfg, train_cfg, batch_iterator(ds, train_cfg.batch_size, seed=SEED),
    resume=True,  # continue own checkpoints after a timeout/crash retry
    max_steps=STEPS,
    eval_fn=make_clip_eval_hook(model_cfg, clip_u8, stable_clip=stable,
                                batch_windows=8),
)
print("best:", json.dumps(ckpt.best_step(ckpt_dir)), flush=True)

# fresh high-pan clip, never used for training or best selection
stable2, unstable2 = synthetic_pair_clip(48, 320, 448, seed=1234,
                                         shake_px=7.0, pan_px=6.0, **RICH)
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
    print(f"RESULT[{mode} seed{SEED} {label}]", json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
print("gt ceiling:",
      round(stability_report(stable2)["stability_score"], 4), flush=True)
