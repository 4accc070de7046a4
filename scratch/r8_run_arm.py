"""One arm of the round-5 CPU-envelope A/B matrix (VERDICT item 1,
dead-tunnel branch): the champion recipe scaled to what the 1-core
host trains at useful step rates (measured: 64^2 lvl6 base32 bs4 =
~4.2 s/step; bs8 is superlinearly slower).

Everything is the champion protocol at half scene scale / quarter
model scale: b4, EMA 0.995, dropout, lr decay from 50%, held-out
eval-hook clip, fresh-clip final scoring.  Arms change EXACTLY ONE
lever each:

  l1       — control (pixel_loss_mode=l1, w_feature=1, default feats)
  mm       — pixel_loss_mode=mean_matched (exposure-robust pixel term)
  grad     — pixel_loss_mode=gradient
  wf_off   — w_feature=0 (perceptual term removed)
  wf_vgg   — feat_channels=(64,128) (VGG-block widths)

Curriculum-vs-not is selected by <data_root> (r8_data_base vs
r8_data_hard — same scene seeds, different stressor draws).

Usage: r8_run_arm.py <data_root> <ckpt_dir> <arm> [steps] [seed]
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

root, ckpt_dir, ARM = sys.argv[1], sys.argv[2], sys.argv[3]
STEPS = int(sys.argv[4]) if len(sys.argv) > 4 else 500
SEED = int(sys.argv[5]) if len(sys.argv) > 5 else 0

ARMS = {
    "l1": {},
    "mm": dict(pixel_loss_mode="mean_matched"),
    "grad": dict(pixel_loss_mode="gradient"),
    "wf_off": dict(w_feature=0.0),
    "wf_vgg": dict(feat_channels=(64, 128)),
}
over = dict(ARMS[ARM])
feat_channels = tuple(over.pop("feat_channels", (32, 64, 128)))

model_cfg = ModelConfig(
    model_resolution=(64, 64), num_levels=6,
    base_features=32, max_features=256,
    use_dropout=True, feat_channels=feat_channels,
)
tkw = dict(
    batch_size=4, num_epochs=1, steps_per_epoch=STEPS, w_feature=1.0,
    log_every=25, checkpoint_every=250, checkpoint_dir=ckpt_dir,
    ema_decay=0.995, eval_every=100, seed=SEED,
)
tkw.update(over)
train_cfg = TrainConfig(**tkw)
ds = DeepStabDataset(
    DataConfig(data_root=root, crop_size=(64, 64), num_decode_threads=2),
    model_cfg.temporal_window,
)
print(f"arm={ARM} data={root} seed={SEED} steps={STEPS} "
      f"pairs={len(ds.pairs)}", flush=True)

# held-out eval clip, champion draws at half scale (shake 7 -> 3.5)
stable, unstable = synthetic_pair_clip(32, 160, 224, seed=999,
                                       shake_px=3.5, **RICH)
clip_u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
state = train(
    model_cfg, train_cfg, batch_iterator(ds, train_cfg.batch_size, seed=SEED),
    resume=True,
    max_steps=STEPS,
    eval_fn=make_clip_eval_hook(model_cfg, clip_u8, stable_clip=stable,
                                batch_windows=8),
)
print("best:", json.dumps(ckpt.best_step(ckpt_dir)), flush=True)

# fresh-clip final scoring (never seen in training or best-step choice)
stable2, unstable2 = synthetic_pair_clip(48, 160, 224, seed=1234,
                                         shake_px=3.5, **RICH)
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
