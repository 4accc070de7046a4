"""Failure-mode sweep for the 61-pair champion (VERDICT r2 item 8).

Scores the champion on fresh clips where ONE stressor at a time is
pushed past its training range, to localize what breaks first.  Each
variant reports stability (out vs unstable baseline), the GT ceiling,
and PSNR vs the GT-stable clip (artifact proxy: warping errors show up
as PSNR drop even when the trajectory is smooth).

Usage: r5_failure_modes.py <ckpt_dir>
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

BASE = dict(RICH, shake_px=7.0, pan_px=1.0)
VARIANTS = {
    # name: kwargs overriding BASE (one stressor pushed at a time)
    "in-distribution": {},
    "shake x2 (14px)": {"shake_px": 14.0},
    "motion blur full-shutter": {"motion_blur": 1.0},
    "exposure steps heavy": {"exposure_steps": 2.0},
    "photometric heavy": {"photometric": 1.5},
    "occluders x4": {"num_occluders": 4},
    "textureless half-frame": {"textureless_frac": 0.5},
    "high pan (6px/frame)": {"pan_px": 6.0},
}

params = ckpt.load_generator_params(ckpt_dir, step="best")
stab = Stabilizer(ModelConfig(), PipelineConfig(batch_windows=8),
                  params=params)

for name, over in VARIANTS.items():
    kw = dict(BASE, **over)
    stable, unstable = synthetic_pair_clip(48, 320, 448, seed=777, **kw)
    u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
    out, _ = stab.stabilize_frames(u8)
    outf = out.astype(np.float32) / 127.5 - 1.0
    rep = stability_report(outf, unstable)
    rep["gt_ceiling"] = stability_report(stable)["stability_score"]
    rep["unstable_baseline"] = stability_report(unstable)["stability_score"]
    rep["psnr_vs_gt"] = psnr(outf, stable)
    print(f"FAIL[{name}]", json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
print("SWEEP OK", flush=True)
