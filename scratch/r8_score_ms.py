"""Paired cross-arm scoring for the multi-scale CPU analog.

Scores the ms arm and the l1 control (each at its best-eval step) on
the SAME fresh clips at two scales:

  - 320x448 shake 7 px, texture_detail_px=4 — the "at-resolution"
    analog (frame width / model width = 7, like 1080p on the 256
    model).  The multi-scale hypothesis predicts the ms arm cuts
    jitter here.
  - 160x224 shake 3.5 px — the control's own training scale
    (regression check: multi-scale training must not cost base-scale
    quality).

Three seeds per scale; mean +- spread per metric.

Usage: r8_score_ms.py <ms_ckpt> <l1_ckpt> [label_a label_b]
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

ms_dir, l1_dir = sys.argv[1], sys.argv[2]
LABEL_A = sys.argv[3] if len(sys.argv) > 3 else "ms"
LABEL_B = sys.argv[4] if len(sys.argv) > 4 else "l1"
model_cfg = ModelConfig(model_resolution=(64, 64), num_levels=6,
                        base_features=32, max_features=256)

SCALES = {
    "320x448": dict(h=320, w=448, shake=7.0, detail=4.0),
    "160x224": dict(h=160, w=224, shake=3.5, detail=0.0),
}
SEEDS = (2024, 2025, 2026)

arms = {}
for name, d in ((LABEL_A, ms_dir), (LABEL_B, l1_dir)):
    params = ckpt.load_generator_params(d, step="best")
    arms[name] = Stabilizer(model_cfg, PipelineConfig(batch_windows=8),
                            params=params)

for scale, sc in SCALES.items():
    acc = {name: [] for name in arms}
    for seed in SEEDS:
        stable, unstable = synthetic_pair_clip(
            48, sc["h"], sc["w"], seed=seed, shake_px=sc["shake"],
            texture_detail_px=sc["detail"], **RICH)
        u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
        base = stability_report(unstable)
        for name, stab in arms.items():
            out, _ = stab.stabilize_frames(u8)
            outf = out.astype(np.float32) / 127.5 - 1.0
            rep = stability_report(outf, unstable)
            rep["psnr_vs_gt"] = psnr(outf, stable)
            rep["unstable_jitter"] = base["jitter_rms_px"]
            acc[name].append(rep)
            print(f"MS[{scale}][{name}][seed{seed}]", json.dumps(
                {k: round(float(v), 4) for k, v in rep.items()}),
                flush=True)
    for name, reps in acc.items():
        agg = {}
        for k in ("stability_score", "jitter_rms_px", "psnr_vs_gt",
                  "distortion_value", "unstable_jitter"):
            vals = np.array([r[k] for r in reps], dtype=np.float64)
            agg[k] = f"{vals.mean():.4f}+-{vals.std():.4f}"
        print(f"MSAGG[{scale}][{name}]", json.dumps(agg), flush=True)
