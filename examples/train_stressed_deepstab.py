"""DeepStab-scale training recipe on the STRESSED rich distribution.

Promoted form of the measured round-5 champion run
(`scratch/r5_train_champion.py`): a 61-pair dataset — the real
DeepStab's size — with the full scene model PLUS the round-5
stressors: motion blur on the unstable view (shutter streaking along
the instantaneous shake, so feature evidence degrades exactly when
stabilization matters) and auto-exposure steps (sudden persistent gain
jumps on top of flicker).  Driven through the real pipeline: threaded
uint8 decode -> async train loop -> generator-EMA -> periodic held-out
eval with best-step auto-tracking -> EMA/best final evals.

Measured round-5 result (1000 steps, seed 0): eval-hook stability
0.784 -> 0.899 (still rising at step 1000 — 61 pairs are not saturated
by the 12-pair schedule), fresh-clip EMA 0.885 vs the 0.908 GT-stable
ceiling; per-stressor failure modes in README ("61-pair stressed
dataset" section).

    PYTHONPATH=. python examples/train_stressed_deepstab.py [steps] [pairs]

Equivalent CLI form:

    python -m pwstablenet_tpu.cli make-data --out /tmp/stressed \
        --pairs 61 --frames 80 --height 320 --width 448 --rich
    python -m pwstablenet_tpu.cli train --data-root /tmp/stressed \
        --steps 1000 --ema-decay 0.995 --use-dropout \
        --eval-every 250 --eval-clip <holdout.avi> \
        --checkpoint-dir /tmp/stressed_ckpt
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
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 61
work = tempfile.mkdtemp(prefix="pwstable_stressed_")
root = os.path.join(work, "data")
ckpt_dir = os.path.join(work, "ckpt")

# RICH already includes motion_blur=0.6 + exposure_steps=0.5 since
# round 5; write_synthetic_deepstab(rich=True) draws per-pair
# shake/pan diversity on top (the measured quality lever)
print(f"writing {PAIRS}-pair stressed dataset under {root} ...",
      flush=True)
write_synthetic_deepstab(root, num_pairs=PAIRS, frames=80, height=320,
                         width=448, seed=5, rich=True)

model_cfg = ModelConfig(use_dropout=True)
train_cfg = TrainConfig(
    batch_size=8, num_epochs=1, steps_per_epoch=STEPS, w_feature=1.0,
    log_every=50, checkpoint_every=500, checkpoint_dir=ckpt_dir,
    ema_decay=0.995, eval_every=250,
)
ds = DeepStabDataset(
    DataConfig(data_root=root, crop_size=(256, 256), num_decode_threads=4),
    model_cfg.temporal_window,
)
print(f"dataset: {len(ds.pairs)} pairs", flush=True)
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
