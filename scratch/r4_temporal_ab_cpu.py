"""Quick CPU A/B: raw vs compensated temporal loss on the e2e test
recipe (60 steps, tiny model, on-disk flat-world DeepStab)."""
import json
import shutil
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from pwstablenet_tpu.config import DataConfig, ModelConfig, TrainConfig
from pwstablenet_tpu.data.deepstab import (
    DeepStabDataset, batch_iterator, write_synthetic_deepstab,
)
from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
from pwstablenet_tpu.eval import stability_score
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train.loop import train

TINY = ModelConfig(
    temporal_window=3, num_levels=3, base_features=8, max_features=32,
    model_resolution=(32, 32), num_stages=2, disc_num_layers=1,
    feat_channels=(8,), compute_dtype="float32",
)

root = "/tmp/ab_deepstab"
shutil.rmtree(root, ignore_errors=True)
write_synthetic_deepstab(root, num_pairs=2, frames=36, height=96,
                         width=128, seed=11)
_, unstable = synthetic_pair_clip(24, 96, 128, seed=99)
clip_u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
s_in = stability_score(unstable)

for mode in ("raw", "compensated"):
    for seed in (0, 1):
        data_cfg = DataConfig(data_root=root, crop_size=(32, 32),
                              num_decode_threads=2)
        train_cfg = TrainConfig(
            batch_size=4, num_epochs=1, steps_per_epoch=60,
            lr_g=4e-4, lr_d=4e-4, w_pixel=200.0, temporal_mode=mode,
            log_every=10, checkpoint_every=10**9,
            checkpoint_dir=f"/tmp/ab_ckpt_{mode}_{seed}", seed=seed,
        )
        ds = DeepStabDataset(data_cfg, TINY.temporal_window)
        it = batch_iterator(ds, train_cfg.batch_size, seed=seed)
        logs = []
        state = train(TINY, train_cfg, it, max_steps=60,
                      log_fn=logs.append)
        pix = [round(m["pixel"], 4) for m in logs]
        tmp = [round(m["temporal"], 4) for m in logs]
        stab = Stabilizer(TINY, params=state.g_params)
        out, flows = stab.stabilize_frames(clip_u8)
        out_f = out.astype(np.float32) / 127.5 - 1.0
        s_out = stability_score(out_f)
        print(json.dumps({
            "mode": mode, "seed": seed, "pixel_trend": pix,
            "temporal_trend": tmp,
            "stability_in": round(s_in, 4),
            "stability_out": round(float(s_out), 4),
            "max_flow": round(float(np.abs(flows).max()), 5),
        }), flush=True)
