"""Pre-generate the benchmark-resolution eval clips (same cache layout
as r5_score_benchres.py) so clip synthesis overlaps champion training
instead of serializing with TPU scoring.

Usage: r5_pregen_benchres_clips.py <outdir>
"""
import os
import sys
import time

import numpy as np

from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip

outdir = sys.argv[1]
os.makedirs(outdir, exist_ok=True)

CONFIGS = {
    "720p": (120, 720, 1280),
    "1080p": (96, 1080, 1920),
    "long448": (240, 320, 448),
}

for name, (T, H, W) in CONFIGS.items():
    cache = os.path.join(outdir, f"{name}.npz")
    t0 = time.time()
    if not os.path.exists(cache):
        scale = H / 320.0
        stable, unstable = synthetic_pair_clip(
            T, H, W, seed=4321, shake_px=7.0 * scale, pan_px=1.0 * scale,
            texture_detail_px=8.0,  # v2: resolution-absolute fine detail
            # (round-5 finding: without it, 720p+ worlds are featureless
            # ~60 px blobs — the metric tracker locks onto occluders and
            # the model input lacks realistic structure)
            **RICH
        )
        np.savez(cache, stable=stable.astype(np.float16),
                 unstable=unstable.astype(np.float16))
        # downstream consumers read the f16 cache; write the avi from
        # the same representation so it is bit-identical either way
        unstable = unstable.astype(np.float16)
        print(f"[{name}] clips generated in {time.time()-t0:.0f}s",
              flush=True)
    else:
        with np.load(cache) as d:
            unstable = d["unstable"].astype(np.float32)
        print(f"[{name}] cache present", flush=True)
    inp = os.path.join(outdir, f"{name}_unstable.avi")
    if not os.path.exists(inp):
        u8 = np.clip((np.asarray(unstable, np.float32) + 1) * 127.5,
                     0, 255).round().astype(np.uint8)
        video_io.write_video(inp, u8, 30.0, "MJPG")
        print(f"[{name}] unstable avi written", flush=True)
print("PREGEN OK", flush=True)
