"""Diagnose the 720p at-resolution quality failure (VERDICT r2 item 1).

The benchres scoring showed stabilized < unstable at 720p (0.737 vs
0.854, distortion 0.599).  This probe works purely from the artifacts
the scoring run produced: the exported warp fields, the stabilized avi
and the cached clip — no TPU needed.

Reports, per clip:
- warp-field magnitude stats over time (spikes? boundary effects?)
- the inter-frame translation trajectory of unstable vs stabilized vs
  GT (where does the instability enter?)
- per-frame tracked translation *residual jitter* (after removing the
  smooth path) so metric-band effects are factored out
"""
import json
import sys

import numpy as np

from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.data.warp_fields import load_warp_fields
from pwstablenet_tpu.eval.metrics import interframe_transforms

outdir = sys.argv[1] if len(sys.argv) > 1 else "scratch/runs/r5_benchres"
name = sys.argv[2] if len(sys.argv) > 2 else "720p"

flows = load_warp_fields(f"{outdir}/{name}_fields.npz")
print("flows", flows.shape, flows.dtype, flush=True)
mag = np.linalg.norm(flows.astype(np.float32), axis=-1)  # (T, h, w)
per_t = mag.reshape(mag.shape[0], -1)
print("flow |d| mean/p99/max per-frame quartiles over time:")
for stat, arr in (
    ("mean", per_t.mean(1)),
    ("p99", np.percentile(per_t, 99, axis=1)),
    ("max", per_t.max(1)),
):
    q = np.percentile(arr, [0, 25, 50, 75, 100])
    print(f"  {stat}: {np.round(q, 4).tolist()}  (first 8: {np.round(arr[:8], 4).tolist()})")

# frame-to-frame flow delta: a smooth stabilizing field changes slowly
d = np.abs(np.diff(flows.astype(np.float32), axis=0)).mean(axis=(1, 2, 3))
print("mean |Δflow| between consecutive frames: quartiles",
      np.round(np.percentile(d, [0, 25, 50, 75, 100]), 5).tolist())
print("  worst 5 steps:", np.argsort(d)[-5:].tolist(), np.round(np.sort(d)[-5:], 4).tolist())

with np.load(f"{outdir}/{name}.npz") as z:
    stable = z["stable"].astype(np.float32)
unst_u8, _ = video_io.read_video(f"{outdir}/{name}_unstable.avi", dtype=np.uint8)
out_u8, _ = video_io.read_video(f"{outdir}/{name}_stabilized.avi", dtype=np.uint8)
unst = unst_u8.astype(np.float32) / 127.5 - 1
outf = out_u8.astype(np.float32) / 127.5 - 1

def traj(frames):
    ms = interframe_transforms(frames)
    tx = np.cumsum([m[0, 2] for m in ms])
    ty = np.cumsum([m[1, 2] for m in ms])
    return tx, ty

def jitter(path, k=9):
    # residual after a moving-average smooth: band-free jitter measure
    pad = np.pad(path, (k // 2, k // 2), mode="edge")
    smooth = np.convolve(pad, np.ones(k) / k, mode="valid")
    return float(np.sqrt(np.mean((path - smooth) ** 2)))

for label, clip in (("unstable", unst), ("stabilized", outf), ("gt", stable)):
    tx, ty = traj(clip)
    print(f"[{label}] jitter rms x={jitter(tx):.3f} y={jitter(ty):.3f} "
          f"px; path extent x=({tx.min():.1f},{tx.max():.1f}) "
          f"y=({ty.min():.1f},{ty.max():.1f})")
    print(f"  tx[0:16] {np.round(tx[:16], 2).tolist()}")
print("DIAG OK", flush=True)
