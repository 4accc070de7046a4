"""CPU-envelope datasets for the round-5 A/B matrix (VERDICT item 1,
dead-tunnel branch): half-scale versions of the round-5 champion data
(base) and the round-7 curriculum data (hard), sized for the 1-core
host.

Scale map (champion protocol -> CPU protocol):
    clips 320x448x64f        ->  160x224x48f
    crop/model 256^2         ->  64^2 (num_levels 6, base 32)
    shake U(3,9) px          ->  U(1.5,4.5)   (same fraction of frame)
    pan   U(0.3,1.8) px/f    ->  U(0.15,0.9)
    curriculum shake U(3,16) ->  U(1.5,8)
    curriculum pan U(0.3,2.5)->  U(0.15,1.25)
    occluders / exposure     ->  unchanged (dimensionless)

The SCENE seed for pair i is identical in both datasets — only the
stressor draws differ — so hard-vs-base training is a paired
comparison on the same worlds.

Usage: r8_gen_cpu_data.py <out_root> <base|hard>
"""
import os
import sys
import time

import cv2
import numpy as np

from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip

out, KIND = sys.argv[1], sys.argv[2]
NUM, FRAMES, H, W, SEED = 31, 48, 160, 224, 5

os.makedirs(os.path.join(out, "stable"), exist_ok=True)
os.makedirs(os.path.join(out, "unstable"), exist_ok=True)


def complete(path):
    if not os.path.exists(path):
        return False
    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n == FRAMES


rng = np.random.default_rng({"base": 50, "hard": 60}[KIND])
t0 = time.time()
for i in range(NUM):
    kw = dict(RICH)
    if KIND == "base":
        kw["shake_px"] = float(rng.uniform(1.5, 4.5))
        kw["pan_px"] = float(rng.uniform(0.15, 0.9))
    else:
        kw["shake_px"] = float(rng.uniform(1.5, 8.0))
        kw["pan_px"] = float(rng.uniform(0.15, 1.25))
        kw["num_occluders"] = int(rng.integers(1, 5))
        kw["exposure_steps"] = float(rng.uniform(0.5, 2.0))
    sp = os.path.join(out, "stable", f"{i:02d}.avi")
    up = os.path.join(out, "unstable", f"{i:02d}.avi")
    if complete(sp) and complete(up):
        continue
    s, u = synthetic_pair_clip(FRAMES, H, W, seed=SEED + i, **kw)
    video_io.write_video(sp, s, 30.0, "MJPG")
    video_io.write_video(up, u, 30.0, "MJPG")
    print(f"pair {i:02d} done ({time.time()-t0:.0f}s)", flush=True)
print(f"ALL {NUM} pairs done in {time.time()-t0:.0f}s", flush=True)
