"""Re-score the high-pan A/B arms on MULTIPLE fresh clips with the
hardened metrics (VERDICT r2 item 2 follow-up).

The in-run fresh-clip scoring used ONE clip and the pre-hardening
tracker; single-eval noise is +-0.03-0.04, and on 6 px/frame pans the
spectral stability score saturates (unstable baseline ~0.91).  This
probe loads each arm's saved weights and scores THREE fresh high-pan
clips, reporting the spectral score AND jitter_rms_px (pan-independent
shake amplitude) + PSNR vs the aligned GT.

Usage: r5_highpan_rescore.py <workdir> [arm ...]
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

work = sys.argv[1]
arms = sys.argv[2:] or ["raw_s0", "compensated_s0"]

EVAL_SEEDS = (1234, 4242, 8888)
clips = []
for s in EVAL_SEEDS:
    stable, unstable = synthetic_pair_clip(48, 320, 448, seed=s,
                                           shake_px=7.0, pan_px=6.0, **RICH)
    u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
    clips.append((s, stable, unstable, u8))
    rep_u = stability_report(unstable)
    rep_g = stability_report(stable)
    print(f"BASE[seed{s}] unstable={rep_u['stability_score']:.4f} "
          f"jit={rep_u['jitter_rms_px']:.2f}px | "
          f"gt={rep_g['stability_score']:.4f} "
          f"jit={rep_g['jitter_rms_px']:.2f}px", flush=True)

for arm in arms:
    params = ckpt.load_generator_params(f"{work}/ckpt_{arm}", step="best")
    stab = Stabilizer(ModelConfig(), PipelineConfig(batch_windows=8),
                      params=params)
    scores, jits, psnrs = [], [], []
    for s, stable, unstable, u8 in clips:
        out, _ = stab.stabilize_frames(u8)
        outf = out.astype(np.float32) / 127.5 - 1.0
        rep = stability_report(outf, unstable)
        rep["psnr_vs_gt"] = psnr(outf, stable)
        scores.append(rep["stability_score"])
        jits.append(rep["jitter_rms_px"])
        psnrs.append(rep["psnr_vs_gt"])
        print(f"ARM[{arm} seed{s}]", json.dumps(
            {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
    print(f"MEAN[{arm}] stability={np.mean(scores):.4f} "
          f"jitter_rms={np.mean(jits):.2f}px psnr={np.mean(psnrs):.2f}",
          flush=True)
print("RESCORE OK", flush=True)
