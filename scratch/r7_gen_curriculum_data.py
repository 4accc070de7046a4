"""Round-4 (driver) curriculum dataset: attack the measured failure
modes WITH DATA (VERDICT r3 item 3).

Same scale/frames as the round-5 champion data (61 pairs, 64 frames,
320x448) so scores compare apples-to-apples, but the per-pair stressor
draws now COVER the failure-mode sweep's stress points instead of
stopping short of them:

  round-5 data          failure-mode stress   curriculum draw
  shake_px U(3,9)       14 px (x2)            U(3,16)
  num_occluders = 1     4                     {1,2,3,4}
  exposure_steps = 0.5  2.0 (heavy)           U(0.5, 2.0)
  pan_px U(0.3,1.8)     6 px/frame            U(0.3, 2.5)

Everything else stays RICH (blur 0.6, photometric 0.5, textureless
0.15 — those rows were already robust).  Resume-capable: skips pairs
whose files are present and complete, replaying their rng draws.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scratch/r7_gen_curriculum_data.py scratch/runs/r7_data
"""
import os
import sys
import time

import cv2
import numpy as np

from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip

out = sys.argv[1]
NUM, FRAMES, H, W, SEED = 61, 64, 320, 448, 5

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
    kw = dict(RICH)
    kw["shake_px"] = float(rng.uniform(3.0, 16.0))
    kw["pan_px"] = float(rng.uniform(0.3, 2.5))
    kw["num_occluders"] = int(rng.integers(1, 5))
    kw["exposure_steps"] = float(rng.uniform(0.5, 2.0))
    sp = os.path.join(out, "stable", f"{i:02d}.avi")
    up = os.path.join(out, "unstable", f"{i:02d}.avi")
    if complete(sp) and complete(up):
        continue
    s, u = synthetic_pair_clip(FRAMES, H, W, seed=SEED + i, **kw)
    video_io.write_video(sp, s, 30.0, "MJPG")
    video_io.write_video(up, u, 30.0, "MJPG")
    print(f"pair {i:02d} done at {time.time()-t0:.0f}s "
          f"(shake {kw['shake_px']:.1f} occl {kw['num_occluders']} "
          f"exp {kw['exposure_steps']:.2f})", flush=True)
print(f"all {NUM} pairs present in {time.time()-t0:.0f}s", flush=True)
