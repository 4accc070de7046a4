"""Multi-scale CPU-analog dataset (VERDICT item 5, dead-tunnel branch).

The staged full-scale recipe (scratch/r6_train_multiscale.py): data at
2x the champion frame size with resolution-absolute fine texture
(texture_detail_px=8 at 640x896), trained with
resize_scale_range=(0.3, 1.0) downscale jitter before the crop.

CPU analog at the same ratios: 320x448 frames (2x the r8 base data),
texture_detail_px=4, SAME rng stream as r8_data_base with every
pixel-valued draw doubled — pair i is the identical world + identical
relative shake as r8_data_base pair i, just rendered at 2x resolution
with fine detail.  At resize scale 0.5 a crop reproduces the base
arm's statistics exactly; at scale 1.0 it sees 2x-shake/2x-feature
content.

Usage: r8_gen_ms_data.py <out_root>
"""
import os
import sys
import time

import cv2
import numpy as np

from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip

out = sys.argv[1]
NUM, FRAMES, H, W, SEED = 31, 48, 320, 448, 5

os.makedirs(os.path.join(out, "stable"), exist_ok=True)
os.makedirs(os.path.join(out, "unstable"), exist_ok=True)


def complete(path):
    if not os.path.exists(path):
        return False
    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n == FRAMES


rng = np.random.default_rng(50)  # the r8_data_base stream
t0 = time.time()
for i in range(NUM):
    kw = dict(RICH)
    # identical draws to gen_base, scaled 2x (same rng consumption order)
    kw["shake_px"] = 2.0 * float(rng.uniform(1.5, 4.5))
    kw["pan_px"] = 2.0 * float(rng.uniform(0.15, 0.9))
    kw["texture_detail_px"] = 4.0
    sp = os.path.join(out, "stable", f"{i:02d}.avi")
    up = os.path.join(out, "unstable", f"{i:02d}.avi")
    if complete(sp) and complete(up):
        continue
    s, u = synthetic_pair_clip(FRAMES, H, W, seed=SEED + i, **kw)
    video_io.write_video(sp, s, 30.0, "MJPG")
    video_io.write_video(up, u, 30.0, "MJPG")
    print(f"pair {i:02d} done ({time.time()-t0:.0f}s)", flush=True)
print(f"ALL {NUM} pairs done in {time.time()-t0:.0f}s", flush=True)
