"""Pre-generate the high-pan A/B dataset (identical to the block in
r5_highpan_ab.py) so it overlaps champion training on the CPU.

Usage: r5_pregen_highpan_data.py <workdir>
"""
import os
import sys
import time

import numpy as np

from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip

work = sys.argv[1]
root = os.path.join(work, "data_highpan")
os.makedirs(os.path.join(root, "stable"), exist_ok=True)
os.makedirs(os.path.join(root, "unstable"), exist_ok=True)
rng = np.random.default_rng(5)
t0 = time.time()
for i in range(12):
    kw = dict(RICH)
    kw["shake_px"] = float(rng.uniform(3.0, 9.0))
    kw["pan_px"] = float(rng.uniform(4.0, 8.0))  # HIGH pan
    sp = os.path.join(root, "stable", f"{i:02d}.avi")
    up = os.path.join(root, "unstable", f"{i:02d}.avi")
    if os.path.exists(sp) and os.path.exists(up):
        continue
    s, u = synthetic_pair_clip(80, 320, 448, seed=5 + i, **kw)
    video_io.write_video(sp, s, 30.0, "MJPG")
    video_io.write_video(up, u, 30.0, "MJPG")
    print(f"pair {i:02d} done at {time.time()-t0:.0f}s", flush=True)
print("HIGHPAN DATA OK", flush=True)
