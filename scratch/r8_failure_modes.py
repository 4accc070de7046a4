"""CPU-envelope failure-mode sweep — r5_failure_modes.py at the
half-scale protocol (160x224 clips, 64^2 lvl6 base32 model), one
stressor pushed past the training range at a time.

Pixel-valued stressors are half the full-scale sweep's (same fraction
of frame size); dimensionless ones are identical.  The rows that the
round-5 A/Bs are built to move:

  "shake x2"         — curriculum (hard data) vs base
  "occluders x4"     — curriculum vs base
  "exposure heavy"   — pixel_loss_mode=mean_matched vs l1

Usage: r8_failure_modes.py <ckpt_dir> [tag]
"""
import json
import sys

import numpy as np

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip
from pwstablenet_tpu.eval import stability_report
from pwstablenet_tpu.eval.metrics import psnr
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train import checkpoint as ckpt

ckpt_dir = sys.argv[1]
TAG = sys.argv[2] if len(sys.argv) > 2 else ckpt_dir

BASE = dict(RICH, shake_px=3.5, pan_px=0.5)
VARIANTS = {
    "in-distribution": {},
    "shake x2 (7px)": {"shake_px": 7.0},
    "motion blur full-shutter": {"motion_blur": 1.0},
    "exposure steps heavy": {"exposure_steps": 2.0},
    "photometric heavy": {"photometric": 1.5},
    "occluders x4": {"num_occluders": 4},
    "textureless half-frame": {"textureless_frac": 0.5},
    "high pan (3px/frame)": {"pan_px": 3.0},
}

params = ckpt.load_generator_params(ckpt_dir, step="best")
stab = Stabilizer(
    ModelConfig(model_resolution=(64, 64), num_levels=6,
                base_features=32, max_features=256),
    PipelineConfig(batch_windows=8), params=params,
)

for name, over in VARIANTS.items():
    kw = dict(BASE, **over)
    stable, unstable = synthetic_pair_clip(48, 160, 224, seed=777, **kw)
    u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
    out, _ = stab.stabilize_frames(u8)
    outf = out.astype(np.float32) / 127.5 - 1.0
    rep = stability_report(outf, unstable)
    rep["gt_ceiling"] = stability_report(stable)["stability_score"]
    rep["unstable_baseline"] = stability_report(unstable)["stability_score"]
    rep["psnr_vs_gt"] = psnr(outf, stable)
    print(f"FAIL[{TAG}][{name}]", json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
print("SWEEP OK", flush=True)
