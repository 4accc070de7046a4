"""Score the champion at the BENCHMARK resolutions (VERDICT r2 item 1)
and on a long clip (item 7's protocol check).

Generates rich synthetic clips at 720p / 1080p (+ a 240-frame long
clip), runs the REAL file->file stabilize_video path with the champion
weights, and reports the full metric trio vs the GT-stable ceiling.

Usage: r5_score_benchres.py <ckpt_dir> <outdir> [which]
  which: all | 720p | 1080p | long448  (default all)
"""
import json
import os
import sys
import time

import numpy as np

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip
from pwstablenet_tpu.eval import stability_report
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train import checkpoint as ckpt

ckpt_dir = sys.argv[1]
outdir = sys.argv[2]
which = sys.argv[3] if len(sys.argv) > 3 else "all"
os.makedirs(outdir, exist_ok=True)

CONFIGS = {
    # name: (frames, H, W)  — 720p/1080p are BASELINE.json's operating
    # points; long448 checks the stability metric's fixed low-frequency
    # band on a >=200-frame trajectory (protocol hardening)
    "720p": (120, 720, 1280),
    "1080p": (96, 1080, 1920),
    "long448": (240, 320, 448),
}

params = ckpt.load_generator_params(ckpt_dir, step="best")
model_cfg = ModelConfig()  # inference: dropout off by construction
stab = Stabilizer(model_cfg, PipelineConfig(batch_windows=8), params=params)

for name, (T, H, W) in CONFIGS.items():
    if which not in ("all", name):
        continue
    cache = os.path.join(outdir, f"{name}.npz")
    t0 = time.time()
    if os.path.exists(cache):
        with np.load(cache) as d:
            stable, unstable = d["stable"], d["unstable"]
        print(f"[{name}] clips loaded from cache", flush=True)
    else:
        scale = H / 320.0  # shake/pan in proportion to the frame
        stable, unstable = synthetic_pair_clip(
            T, H, W, seed=4321, shake_px=7.0 * scale, pan_px=1.0 * scale,
            texture_detail_px=8.0,  # v2 clips (see r5_pregen_benchres)
            **RICH
        )
        np.savez(cache, stable=stable.astype(np.float16),
                 unstable=unstable.astype(np.float16))
        print(f"[{name}] clips generated in {time.time()-t0:.0f}s", flush=True)
    stable = stable.astype(np.float32)
    unstable = unstable.astype(np.float32)
    u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
    inp = os.path.join(outdir, f"{name}_unstable.avi")
    outp = os.path.join(outdir, f"{name}_stabilized.avi")
    if not os.path.exists(inp):
        video_io.write_video(inp, u8, 30.0, "MJPG")
    t0 = time.time()
    r = stab.stabilize_video(inp, outp,
                             warp_field_path=os.path.join(
                                 outdir, f"{name}_fields.npz"))
    wall = time.time() - t0
    out_clip, _ = video_io.read_video(outp, dtype=np.uint8)
    outf = out_clip.astype(np.float32) / 127.5 - 1.0
    # metrics vs the DECODED unstable (what the pipeline actually saw)
    in_clip, _ = video_io.read_video(inp, dtype=np.uint8)
    inf = in_clip.astype(np.float32) / 127.5 - 1.0
    rep = stability_report(outf, inf)
    gt_rep = stability_report(stable)
    rep["gt_ceiling"] = gt_rep["stability_score"]
    rep["gt_jitter_rms_px"] = gt_rep["jitter_rms_px"]
    # aligned-GT fidelity (synthetic: the stable clip IS the target path)
    from pwstablenet_tpu.eval.metrics import psnr

    rep["psnr_vs_gt"] = psnr(outf, stable)
    rep["fps_wall_file2file"] = r["frames"] / wall
    rep["frames"] = r["frames"]
    print(f"SCORE[{name}]", json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
