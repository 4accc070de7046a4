"""Flagship training recipe on the RICH synthetic distribution.

This is the promoted form of the measured round-2 run
(`scratch/r4_train_rich.py`): an on-disk DeepStab-shaped dataset with
the full scene model (perspective shake, parallax layers, moving
occluders, photometric jitter, textureless regions — see
`data.synthetic.RICH`) driven through the real pipeline: threaded uint8
decode -> async train loop -> generator-EMA -> periodic held-out eval
with best-step auto-tracking -> raw/EMA/best final evals.

    PYTHONPATH=. python examples/train_rich_deepstab.py [steps]

Equivalent CLI form (using the built-in dataset generator):

    python -m pwstablenet_tpu.cli make-data --out /tmp/rich --pairs 12 \
        --frames 80 --height 320 --width 448 --rich
    python -m pwstablenet_tpu.cli train --data-root /tmp/rich \
        --steps 1000 --ema-decay 0.995 --eval-every 250 \
        --eval-clip <holdout.avi> --checkpoint-dir /tmp/rich_ckpt
    python -m pwstablenet_tpu.cli stabilize --checkpoint /tmp/rich_ckpt \
        --checkpoint-step best --input shaky.avi --output stable.mp4
"""
import json
import os
import sys
import tempfile

import numpy as np

from pwstablenet_tpu.config import (
    DataConfig, ModelConfig, PipelineConfig, TrainConfig,
)
from pwstablenet_tpu.data.deepstab import (
    DeepStabDataset, batch_iterator, write_synthetic_deepstab,
)
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip
from pwstablenet_tpu.eval import stability_report
from pwstablenet_tpu.eval.hooks import make_clip_eval_hook
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train import checkpoint as ckpt
from pwstablenet_tpu.train.loop import train
from pwstablenet_tpu.train.state import generator_params

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
work = tempfile.mkdtemp(prefix="pwstable_rich_")
root = os.path.join(work, "data")
ckpt_dir = os.path.join(work, "ckpt")

print(f"writing rich dataset under {root} ...", flush=True)
write_synthetic_deepstab(root, num_pairs=12, frames=80, height=320,
                         width=448, seed=5, rich=True)

model_cfg = ModelConfig()
train_cfg = TrainConfig(
    batch_size=8, num_epochs=1, steps_per_epoch=STEPS, w_feature=1.0,
    log_every=50, checkpoint_every=500, checkpoint_dir=ckpt_dir,
    ema_decay=0.995, eval_every=250,
)
ds = DeepStabDataset(
    DataConfig(data_root=root, crop_size=(256, 256), num_decode_threads=4),
    model_cfg.temporal_window,
)
stable, unstable = synthetic_pair_clip(32, 320, 448, seed=999,
                                       shake_px=7.0, **RICH)
clip_u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
state = train(
    model_cfg, train_cfg, batch_iterator(ds, train_cfg.batch_size, seed=0),
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
    rep = stability_report(out.astype(np.float32) / 127.5 - 1.0, unstable2)
    print(f"EVAL[{label}]", json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
print("gt-stable ceiling:",
      round(stability_report(stable2)["stability_score"], 4), flush=True)
