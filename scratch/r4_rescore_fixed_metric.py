"""Rescore the round-2 best-step exports with the FIXED distortion
metric (full-affine anisotropy — the similarity-based fit reported
~1.0 unconditionally).  CPU-only; reads the /tmp checkpoint exports."""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.data.synthetic import RICH, synthetic_pair_clip
from pwstablenet_tpu.eval import stability_report
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train import checkpoint as ckpt

model_cfg = ModelConfig()
stable2, unstable2 = synthetic_pair_clip(
    48, 320, 448, seed=1234, shake_px=7.0, **RICH
)
u8 = np.clip((unstable2 + 1) * 127.5, 0, 255).round().astype(np.uint8)

for tag in ("r4rich_compensated", "r4rich_raw", "r4rich_compensated_drop"):
    d = f"/tmp/{tag}_ckpt"
    try:
        params = ckpt.load_generator_params(d, step="best")
        info = ckpt.best_step(d)
    except FileNotFoundError as e:
        print(f"{tag}: {e}")
        continue
    stab = Stabilizer(model_cfg, PipelineConfig(batch_windows=8),
                      params=params)
    out, _ = stab.stabilize_frames(u8)
    rep = stability_report(out.astype(np.float32) / 127.5 - 1.0, unstable2)
    print(f"{tag} (best@{info['step']}): " + json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
print("gt ceiling:", round(
    stability_report(stable2)["stability_score"], 4), flush=True)
