"""Resume-capable variant of r6_gen_data.py: regenerates only missing
or truncated pairs of the 61-pair multi-scale dataset (640x896,
texture_detail_px=8), consuming the per-pair rng draws for present
pairs so the result is bit-identical to a fresh run.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scratch/r6_gen_data_resume.py scratch/runs/r6_data
"""
import os
import sys
import time

import cv2
import numpy as np

from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip

out = sys.argv[1]
NUM, FRAMES, H, W, SEED = 61, 80, 640, 896, 5

os.makedirs(os.path.join(out, "stable"), exist_ok=True)
os.makedirs(os.path.join(out, "unstable"), exist_ok=True)


def complete(path):
    if not os.path.exists(path):
        return False
    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n == FRAMES


rng = np.random.default_rng(SEED)
t0 = time.time()
for i in range(NUM):
    kw = dict(RICH, texture_detail_px=8.0)
    # identical draw order to r6_gen_data.py / r6_train_multiscale.py
    scale = H / 320.0
    kw["shake_px"] = float(rng.uniform(3.0, 9.0)) * scale
    kw["pan_px"] = float(rng.uniform(0.3, 1.8)) * scale
    sp = os.path.join(out, "stable", f"{i:02d}.avi")
    up = os.path.join(out, "unstable", f"{i:02d}.avi")
    if complete(sp) and complete(up):
        continue
    s, u = synthetic_pair_clip(FRAMES, H, W, seed=SEED + i, **kw)
    video_io.write_video(sp, s, 30.0, "MJPG")
    video_io.write_video(up, u, 30.0, "MJPG")
    print(f"pair {i:02d} done at {time.time()-t0:.0f}s", flush=True)
print(f"all {NUM} pairs present in {time.time()-t0:.0f}s", flush=True)
