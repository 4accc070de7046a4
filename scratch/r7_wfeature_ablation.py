"""C12 feature-loss ablation (VERDICT r3 item 5): does the perceptual
term earn its flops in this architecture?

Arms (champion recipe on the round-5 61-pair data, one seed each,
identical eval + fresh-clip protocol to r5_train_champion.py):

  off        — w_feature = 0 (term removed)
  default    — w_feature = 1, frozen RANDOM extractor, feat_channels
               (32, 64, 128) (the shipping default; random deep
               features as a perceptual metric, models/features.py)
  vgg_width  — w_feature = 1, frozen random extractor at VGG block
               widths (64, 128) — the exact topology the torchvision
               VGG import restores, so this measures the import path's
               architecture with the only weights available offline
               (no network: real pretrained VGG weights unreachable;
               re-run via interop.torchvision_vgg_to_flax when they are)

Usage: r7_wfeature_ablation.py <data_root> <ckpt_dir> <arm> [steps] [seed]
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
from pwstablenet_tpu.eval.hooks import make_clip_eval_hook
from pwstablenet_tpu.eval.metrics import psnr
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train import checkpoint as ckpt
from pwstablenet_tpu.train.loop import train
from pwstablenet_tpu.train.state import generator_params

root, ckpt_dir, ARM = sys.argv[1], sys.argv[2], sys.argv[3]
STEPS = int(sys.argv[4]) if len(sys.argv) > 4 else 1000
SEED = int(sys.argv[5]) if len(sys.argv) > 5 else 0

ARMS = {
    "off": dict(w_feature=0.0, feat_channels=(32, 64, 128)),
    "default": dict(w_feature=1.0, feat_channels=(32, 64, 128)),
    "vgg_width": dict(w_feature=1.0, feat_channels=(64, 128)),
}
arm = ARMS[ARM]

model_cfg = ModelConfig(use_dropout=True,
                        feat_channels=tuple(arm["feat_channels"]))
train_cfg = TrainConfig(
    batch_size=8, num_epochs=1, steps_per_epoch=STEPS,
    w_feature=arm["w_feature"],
    log_every=50, checkpoint_every=500, checkpoint_dir=ckpt_dir,
    ema_decay=0.995, eval_every=250, seed=SEED,
)
ds = DeepStabDataset(
    DataConfig(data_root=root, crop_size=(256, 256), num_decode_threads=4),
    model_cfg.temporal_window,
)
print(f"arm={ARM} w_feature={arm['w_feature']} "
      f"feat_channels={arm['feat_channels']} pairs={len(ds.pairs)}",
      flush=True)

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
    outf = out.astype(np.float32) / 127.5 - 1.0
    rep = stability_report(outf, unstable2)
    rep["psnr_vs_gt"] = psnr(outf, stable2)
    print(f"EVAL[{ARM}/{label}]", json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
print("gt-stable ceiling:",
      round(stability_report(stable2)["stability_score"], 4), flush=True)
