"""Champion-61 multi-clip re-score with the FINAL (v3) tracker.

Single-eval noise is +-0.03-0.04 (VERDICT r2 weak-3); this scores the
champion on FOUR fresh in-distribution clips (never seen in training
or best-step selection) and reports mean +- spread for stability,
jitter and PSNR.  Runs on CPU when the TPU is down — quality metrics
are device-independent.

Usage: r5_champion_multiclip.py <ckpt_dir>
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
params = ckpt.load_generator_params(ckpt_dir, step="best")
stab = Stabilizer(ModelConfig(), PipelineConfig(batch_windows=8),
                  params=params)

rows = []
for s in (777, 1234, 2468, 9876):
    stable, unstable = synthetic_pair_clip(
        48, 320, 448, seed=s, shake_px=7.0, pan_px=1.0, **RICH
    )
    u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
    out, _ = stab.stabilize_frames(u8)
    outf = out.astype(np.float32) / 127.5 - 1.0
    rep = stability_report(outf, unstable)
    rep["gt_ceiling"] = stability_report(stable)["stability_score"]
    rep["psnr_vs_gt"] = psnr(outf, stable)
    rows.append(rep)
    print(f"CLIP[seed{s}]", json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)

keys = ("stability_score", "original_stability_score", "jitter_rms_px",
        "original_jitter_rms_px", "gt_ceiling", "psnr_vs_gt",
        "cropping_ratio", "distortion_value")
mean = {k: float(np.mean([r[k] for r in rows])) for k in keys}
spread = {k: float(np.std([r[k] for r in rows])) for k in keys}
print("MEAN", json.dumps({k: round(v, 4) for k, v in mean.items()}),
      flush=True)
print("STD ", json.dumps({k: round(v, 4) for k, v in spread.items()}),
      flush=True)
print("MULTICLIP OK", flush=True)
