"""Zero-shot higher working resolution: run the 256^2-trained champion
at model_resolution 512^2 on the 720p benchmark clip.

Motivation (round-5 at-resolution scoring): residual jitter after
stabilization is ~0.5-0.7% of frame width at every resolution —
consistent with the fixed 256^2 working resolution bounding the warp
field's relative accuracy.  The UNet is fully convolutional (8
stride-2 levels; at 512 input the deepest feature is 2x2 instead of
1x1) and instance norm has no spatial state, so the SAME trained
params apply unchanged at a finer working resolution.

Lean protocol (first attempt wedged invisibly for 55 min): phase
prints with flush, quality metrics limited to stability + jitter +
PSNR (the benchres run already has cropping/distortion at 256), device
timing LAST so a stall cannot lose the quality result.  Run with
`python -u` and a direct file redirect — tpu_run.sh's grep pipe
full-buffers output.

Usage: r5_modelres512_probe.py <ckpt_dir> <benchres_dir>
"""
import json
import sys
import time

import numpy as np

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.eval.metrics import jitter_rms_px, psnr, stability_score
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train import checkpoint as ckpt

ckpt_dir = sys.argv[1]
brdir = sys.argv[2]

t0 = time.time()
with np.load(f"{brdir}/720p.npz") as z:
    stable = z["stable"].astype(np.float32)
unst_u8, _ = video_io.read_video(f"{brdir}/720p_unstable.avi",
                                 dtype=np.uint8)
params = ckpt.load_generator_params(ckpt_dir, step="best")
print(f"loaded clip {unst_u8.shape} + params in {time.time()-t0:.0f}s",
      flush=True)

results = {}
for res in (256, 512):  # resolutions must divide by 2^num_levels = 256
    cfg = ModelConfig(model_resolution=(res, res))
    stab = Stabilizer(cfg, PipelineConfig(batch_windows=8), params=params)
    t0 = time.time()
    out, _ = stab.stabilize_frames(unst_u8)
    print(f"[{res}] stabilized 120 frames in {time.time()-t0:.0f}s",
          flush=True)
    outf = out.astype(np.float32) / 127.5 - 1.0
    t0 = time.time()
    rep = {
        "stability_score": stability_score(outf),
        "jitter_rms_px": jitter_rms_px(outf),
        "psnr_vs_gt": psnr(outf, stable),
    }
    results[res] = rep
    print(f"RES[{res}]", json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}),
        f"(metrics {time.time()-t0:.0f}s)", flush=True)

# device timing last (separate compile; a stall here loses nothing)
import jax

from pwstablenet_tpu.utils.timing import device_time

for res in (256, 512):
    cfg = ModelConfig(model_resolution=(res, res))
    stab = Stabilizer(cfg, PipelineConfig(batch_windows=8), params=params)
    frames8 = unst_u8[: 8 + cfg.temporal_window - 1]
    dev = jax.device_put(frames8)
    use_pallas = stab._pallas_ok(frames8.shape)
    sec = device_time(
        lambda p, f: stab._chunk_step(p, f, use_pallas),
        (stab.params, dev),
    )
    print(f"TIME[{res}] {sec*1e3:.2f} ms/chunk8 = "
          f"{8.0/sec:.0f} fps 720p device", flush=True)
print("MODELRES OK", flush=True)
