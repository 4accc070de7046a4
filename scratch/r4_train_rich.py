"""Round-2 flagship TPU training on the RICH synthetic distribution
(VERDICT r1 item 1): perspective shake + parallax layers + moving
occluders + photometric jitter + textureless regions, 12 pairs with
per-pair motion diversity.

Usage: scratch/tpu_run.sh 7200 scratch/r4_train_rich.py [temporal_mode] [steps]

Evaluates:
- periodic eval hook on a rich held-out clip (best-step auto-tracking live)
- final raw-vs-EMA eval on a FRESH rich clip
- no-regression eval on the OLD flat-world distribution
"""
import glob
import json
import shutil
import sys
import time

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

MODE = sys.argv[1] if len(sys.argv) > 1 else "compensated"
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
DROPOUT = "dropout" in sys.argv[3:]
CAUSAL = "causal" in sys.argv[3:]
SEED = 0
for a in sys.argv[3:]:
    if a.startswith("seed="):
        SEED = int(a.split("=")[1])
tag = (f"r4rich_{MODE}" + ("_drop" if DROPOUT else "")
       + ("_causal" if CAUSAL else "")
       + (f"_s{SEED}" if SEED else ""))
# dataset is mode-independent: share it between A/B runs (rich
# generation is ~3 min/pair host-side)
root = "/tmp/deepstab_r4rich_compensated"
ckpt_dir = f"/tmp/{tag}_ckpt"
shutil.rmtree(ckpt_dir, ignore_errors=True)

import os
if len(glob.glob(os.path.join(root, "unstable", "*.avi"))) == 12:
    print(f"reusing RICH dataset at {root}", flush=True)
else:
    print(f"writing RICH dataset ({tag})...", flush=True)
    shutil.rmtree(root, ignore_errors=True)
    write_synthetic_deepstab(root, num_pairs=12, frames=80, height=320,
                             width=448, seed=5, rich=True)

model_cfg = ModelConfig(
    use_dropout=DROPOUT,
    temporal_center=6 if CAUSAL else None,  # T=7: current frame last
)  # flagship 256x256, 2 stages, T=7
train_cfg = TrainConfig(
    batch_size=8, num_epochs=1, steps_per_epoch=STEPS, w_feature=1.0,
    temporal_mode=MODE, seed=SEED,
    log_every=50, checkpoint_every=500,
    checkpoint_dir=ckpt_dir,
    ema_decay=0.995, eval_every=250,
)
data_cfg = DataConfig(data_root=root, crop_size=(256, 256),
                      num_decode_threads=4)
ds = DeepStabDataset(data_cfg, model_cfg.temporal_window,
                     temporal_center=model_cfg.temporal_center)
it = batch_iterator(ds, train_cfg.batch_size, seed=SEED)

# held-out eval clip from the SAME rich distribution
stable, unstable = synthetic_pair_clip(
    32, 320, 448, seed=999, shake_px=7.0, **RICH
)
clip_u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
hook = make_clip_eval_hook(
    model_cfg, clip_u8, stable_clip=stable, batch_windows=8
)

t0 = time.time()
state = train(model_cfg, train_cfg, it, max_steps=STEPS,
              log_fn=lambda m: print(json.dumps(m), flush=True),
              eval_fn=hook)
print(f"trained {STEPS} steps in {time.time()-t0:.0f}s", flush=True)
print("best-step record:", json.dumps(ckpt.best_step(ckpt_dir)), flush=True)


def eval_params(label, params, clip_unstable, clip_stable):
    stab = Stabilizer(model_cfg, PipelineConfig(batch_windows=8),
                      params=params)
    u8 = np.clip((clip_unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
    out, flows = stab.stabilize_frames(u8)
    out_f = out.astype(np.float32) / 127.5 - 1.0
    rep = stability_report(out_f, clip_unstable)
    rep["mean_abs_flow_px"] = float(np.abs(np.asarray(flows)).mean() * 352)
    print(f"EVAL[{label}] " + json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
    return rep


# fresh RICH clip: raw vs EMA vs best-export weights
stable2, unstable2 = synthetic_pair_clip(
    48, 320, 448, seed=1234, shake_px=7.0, **RICH
)
eval_params("rich_raw", generator_params(state, prefer_ema=False),
            unstable2, stable2)
eval_params("rich_ema", generator_params(state), unstable2, stable2)
try:
    best_params = ckpt.load_generator_params(ckpt_dir, step="best")
    eval_params("rich_best", best_params, unstable2, stable2)
except FileNotFoundError as e:
    print("no best export:", e, flush=True)
print("rich baselines: unstable "
      f"{stability_report(unstable2)['stability_score']:.4f}  gt "
      f"{stability_report(stable2)['stability_score']:.4f}", flush=True)

# no-regression check: OLD flat-world distribution
stable3, unstable3 = synthetic_pair_clip(48, 320, 448, seed=4321,
                                         shake_px=7.0)
eval_params("flat_ema", generator_params(state), unstable3, stable3)
print("flat baselines: unstable "
      f"{stability_report(unstable3)['stability_score']:.4f}  gt "
      f"{stability_report(stable3)['stability_score']:.4f}", flush=True)
print("DONE", flush=True)
