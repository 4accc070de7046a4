"""Generate the multi-scale training dataset AHEAD of the TPU run.

Exactly the generation block of r6_train_multiscale.py (same seeds,
same rng draw order) so the training script finds the data on disk and
skips synthesis.  Run on CPU while waiting for the chip:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scratch/r6_gen_data.py scratch/runs/r6_data
"""
import os
import sys

import numpy as np

from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip

root = sys.argv[1]
H, W = 640, 896  # keep in sync with r6_train_multiscale.py

if os.path.isdir(root):
    print("already exists:", root)
    sys.exit(0)

rng = np.random.default_rng(5)
os.makedirs(os.path.join(root, "stable"), exist_ok=True)
os.makedirs(os.path.join(root, "unstable"), exist_ok=True)
for i in range(61):
    kw = dict(RICH, texture_detail_px=8.0)
    scale = H / 320.0
    kw["shake_px"] = float(rng.uniform(3.0, 9.0)) * scale
    kw["pan_px"] = float(rng.uniform(0.3, 1.8)) * scale
    s, u = synthetic_pair_clip(80, H, W, seed=5 + i, **kw)
    video_io.write_video(os.path.join(root, "stable", f"{i:02d}.avi"),
                         s, 30.0, "MJPG")
    video_io.write_video(os.path.join(root, "unstable", f"{i:02d}.avi"),
                         u, 30.0, "MJPG")
    print(f"pair {i:02d} written", flush=True)
print("DONE", flush=True)
