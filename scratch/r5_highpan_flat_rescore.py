"""High-pan A/B, measurement-valid variant: FLAT-world eval clips.

The rich high-pan eval clips turned out to be degenerate for
trajectory metrics: parallax layers move at 1.2-1.4x the camera and
occluders on their own paths, so at 6 px/frame pan the per-frame
affine fit flickers across depths — GT-STABLE clips measure
3.8-6.5 px jitter_rms (measurement noise, not motion).  On a flat
world the global camera path is well-defined and the metric premise
holds, so "does the raw temporal form fight the pan?" becomes
directly measurable:

- jitter_rms_px (shake left in the output),
- pan-following residual: RMS deviation of the output's tracked path
  from ITS OWN best-fit line (the GT pan is linear; a model that
  fights the pan bends/lags the path),
- pan slope recovered vs GT slope (a model that suppresses pan
  shrinks the slope),
- cropping ratio + PSNR vs the aligned GT.

Usage: r5_highpan_flat_rescore.py <workdir> [arm ...]
"""
import json
import sys

import numpy as np

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
from pwstablenet_tpu.eval import stability_report
from pwstablenet_tpu.eval.metrics import interframe_transforms, psnr
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train import checkpoint as ckpt

work = sys.argv[1]
arms = sys.argv[2:] or ["raw_s0", "compensated_s0"]

PAN = 6.0


def path_stats(frames):
    ms = interframe_transforms(frames)
    tx = np.cumsum([m[0, 2] for m in ms])
    t = np.arange(len(tx), dtype=np.float64)
    slope, icpt = np.polyfit(t, tx, 1)
    resid = float(np.sqrt(np.mean((tx - (slope * t + icpt)) ** 2)))
    return float(slope), resid


EVAL_SEEDS = (1234, 4242, 8888)
clips = []
for s in EVAL_SEEDS:
    stable, unstable = synthetic_pair_clip(
        48, 320, 448, seed=s, shake_px=7.0, pan_px=PAN
    )  # flat world: every scene knob off
    u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
    clips.append((s, stable, unstable, u8))
    sl_g, res_g = path_stats(stable)
    sl_u, res_u = path_stats(unstable)
    ju = stability_report(unstable)["jitter_rms_px"]
    jg = stability_report(stable)["jitter_rms_px"]
    print(f"BASE[seed{s}] gt slope={sl_g:.2f}px/fr resid={res_g:.2f} "
          f"jit={jg:.2f} | unstable slope={sl_u:.2f} resid={res_u:.2f} "
          f"jit={ju:.2f}", flush=True)

for arm in arms:
    params = ckpt.load_generator_params(f"{work}/ckpt_{arm}", step="best")
    stab = Stabilizer(ModelConfig(), PipelineConfig(batch_windows=8),
                      params=params)
    rows = []
    for s, stable, unstable, u8 in clips:
        out, _ = stab.stabilize_frames(u8)
        outf = out.astype(np.float32) / 127.5 - 1.0
        rep = stability_report(outf, unstable)
        slope, resid = path_stats(outf)
        row = {
            "jitter_rms_px": rep["jitter_rms_px"],
            "pan_slope_px_fr": slope,
            "pan_resid_px": resid,
            "cropping_ratio": rep["cropping_ratio"],
            "distortion_value": rep["distortion_value"],
            "psnr_vs_gt": psnr(outf, stable),
            "stability_score": rep["stability_score"],
        }
        rows.append(row)
        print(f"ARM[{arm} seed{s}]", json.dumps(
            {k: round(float(v), 4) for k, v in row.items()}), flush=True)
    mean = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    print(f"MEAN[{arm}]", json.dumps(
        {k: round(v, 4) for k, v in mean.items()}), flush=True)
print("FLAT RESCORE OK", flush=True)
