"""Zero-shot higher working resolution: run the 256^2-trained champion
at model_resolution 512^2 on the 720p benchmark clip.

Motivation (round-5 at-resolution scoring): residual jitter after
stabilization is ~0.5% of frame width at every resolution — consistent
with a fixed 256^2 working resolution bounding the warp field's
relative accuracy.  The UNet is fully convolutional (8 stride-2
levels; at 512 input the deepest feature is 2x2 instead of 1x1) and
instance-norm has no spatial state, so the SAME trained params apply
unchanged at a finer resolution.  If zero-shot 512 halves the residual
at 4x generator flops, resolution-scalable inference becomes a
config knob rather than a retrain.

Also times the device path at both resolutions for the quality/fps
trade.

Usage: r5_modelres512_probe.py <ckpt_dir> <benchres_dir>
"""
import json
import sys

import numpy as np

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.eval import stability_report
from pwstablenet_tpu.eval.metrics import psnr
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train import checkpoint as ckpt
from pwstablenet_tpu.utils.timing import device_time

ckpt_dir = sys.argv[1]
brdir = sys.argv[2]

with np.load(f"{brdir}/720p.npz") as z:
    stable = z["stable"].astype(np.float32)
unst_u8, _ = video_io.read_video(f"{brdir}/720p_unstable.avi",
                                 dtype=np.uint8)
params = ckpt.load_generator_params(ckpt_dir, step="best")

for res in (256, 512):  # resolutions must divide by 2^num_levels = 256
    cfg = ModelConfig(model_resolution=(res, res))
    stab = Stabilizer(cfg, PipelineConfig(batch_windows=8), params=params)
    out, _ = stab.stabilize_frames(unst_u8)
    outf = out.astype(np.float32) / 127.5 - 1.0
    inf = unst_u8.astype(np.float32) / 127.5 - 1.0
    rep = stability_report(outf, inf)
    rep["psnr_vs_gt"] = psnr(outf, stable)
    # device time per chunk (8 windows, pipeline batch), bench protocol
    import jax

    frames8 = unst_u8[: 8 + cfg.temporal_window - 1]
    dev = jax.device_put(frames8)
    use_pallas = stab._pallas_ok(frames8.shape)
    sec = device_time(
        lambda p, f: stab._chunk_step(p, f, use_pallas),
        (stab.params, dev),
    )
    rep["device_ms_chunk8"] = sec * 1e3
    rep["fps_720p_device"] = 8.0 / sec
    print(f"RES[{res}]", json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
print("gt ceiling:",
      json.dumps({k: round(float(v), 4) for k, v in
                  stability_report(stable).items()}), flush=True)
print("MODELRES OK", flush=True)
