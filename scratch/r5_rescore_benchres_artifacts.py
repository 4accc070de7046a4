"""Metrics-only re-score of the saved benchres artifacts with the
FINAL metric version (post interior-only jitter fix).

The TPU scoring run produced the stabilized avis before the jitter
edge-bias fix landed; this recomputes every number from the saved
artifacts (no model, no TPU) so the README table is consistent with
the shipped metric.

Usage: r5_rescore_benchres_artifacts.py <benchres_dir>
"""
import json
import sys

import numpy as np

from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.eval import stability_report
from pwstablenet_tpu.eval.metrics import jitter_rms_px, psnr

outdir = sys.argv[1]
for name in ("720p", "1080p", "long448"):
    with np.load(f"{outdir}/{name}.npz") as z:
        stable = z["stable"].astype(np.float32)
    unst_u8, _ = video_io.read_video(f"{outdir}/{name}_unstable.avi",
                                     dtype=np.uint8)
    out_u8, _ = video_io.read_video(f"{outdir}/{name}_stabilized.avi",
                                    dtype=np.uint8)
    inf = unst_u8.astype(np.float32) / 127.5 - 1.0
    outf = out_u8.astype(np.float32) / 127.5 - 1.0
    rep = stability_report(outf, inf)
    gt = stability_report(stable)
    rep["gt_ceiling"] = gt["stability_score"]
    rep["gt_jitter_rms_px"] = gt["jitter_rms_px"]
    rep["psnr_vs_gt"] = psnr(outf, stable)
    print(f"SCORE[{name}]", json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
print("RESCORE OK", flush=True)
