"""Resume-capable variant of r5_gen_data.py: regenerates only missing
pairs of the 61-pair rich dataset, consuming the per-pair rng draws for
already-present pairs so the result is bit-identical to a fresh run of
write_synthetic_deepstab(num_pairs=61, frames=64, 320x448, seed=5,
rich=True)."""
import os
import sys
import time

import numpy as np

from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip

out = sys.argv[1]
NUM, FRAMES, H, W, SEED = 61, 64, 320, 448, 5

os.makedirs(os.path.join(out, "stable"), exist_ok=True)
os.makedirs(os.path.join(out, "unstable"), exist_ok=True)
rng = np.random.default_rng(SEED)
t0 = time.time()
for i in range(NUM):
    kw = dict(RICH)
    # identical draw order to write_synthetic_deepstab
    kw["shake_px"] = float(rng.uniform(3.0, 9.0))
    kw["pan_px"] = float(rng.uniform(0.3, 1.8))
    sp = os.path.join(out, "stable", f"{i:02d}.avi")
    up = os.path.join(out, "unstable", f"{i:02d}.avi")
    if os.path.exists(sp) and os.path.exists(up):
        continue
    s, u = synthetic_pair_clip(FRAMES, H, W, seed=SEED + i, **kw)
    video_io.write_video(sp, s, 30.0, "MJPG")
    video_io.write_video(up, u, 30.0, "MJPG")
    print(f"pair {i:02d} done at {time.time()-t0:.0f}s", flush=True)
print(f"all {NUM} pairs present in {time.time()-t0:.0f}s", flush=True)
