"""Stacked-recipe dataset: the hard curriculum rendered at 2x scale.

Round-5 capstone data — combines the two measured-positive DATA levers
in one set:
  - hard-curriculum stressor draws (r8_gen_cpu_data.py `hard`: shake
    U(1.5,8)*2, pan U(0.15,1.25)*2, occluders 1-4, exposure steps
    0.5-2.0; pixel-valued draws doubled for the 2x frame, dimensionless
    ones unchanged)
  - multi-scale rendering (r8_gen_ms_data.py: 320x448 frames,
    texture_detail_px=4)

The rng stream is the hard set's (seed 60) consumed in the identical
order, and the SCENE seed for pair i matches both r8 datasets — so
stack-vs-hard training is a paired comparison on the same worlds,
differing only in rendering scale.

Usage: r8_gen_stack_data.py <out_root>
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


rng = np.random.default_rng(60)  # the r8_data_hard stream
t0 = time.time()
for i in range(NUM):
    kw = dict(RICH)
    # identical draw ORDER to the hard generator; pixel draws x2
    kw["shake_px"] = 2.0 * float(rng.uniform(1.5, 8.0))
    kw["pan_px"] = 2.0 * float(rng.uniform(0.15, 1.25))
    kw["num_occluders"] = int(rng.integers(1, 5))
    kw["exposure_steps"] = float(rng.uniform(0.5, 2.0))
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
