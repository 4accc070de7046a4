"""On-disk DeepStab-pipeline training on the real TPU: write synthetic
stable/unstable video pairs, train through the CLI-equivalent loader
path (decode threads -> uint8 batches -> async loop), then evaluate
stabilization of a held-out clip."""
import json, shutil, time
import numpy as np
import jax

from pwstablenet_tpu.config import DataConfig, ModelConfig, TrainConfig, PipelineConfig
from pwstablenet_tpu.data.deepstab import (
    DeepStabDataset, batch_iterator, write_synthetic_deepstab)
from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
from pwstablenet_tpu.eval import stability_report
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train.loop import train

root = "/tmp/deepstab_tpu"
shutil.rmtree(root, ignore_errors=True)
print("writing dataset...", flush=True)
write_synthetic_deepstab(root, num_pairs=4, frames=60, height=320,
                         width=448, seed=5)

model_cfg = ModelConfig()  # flagship 256x256, 2 stages, T=7
train_cfg = TrainConfig(
    batch_size=8, num_epochs=1, steps_per_epoch=300, w_feature=1.0,
    log_every=50, checkpoint_every=10**9,
    checkpoint_dir="/tmp/deepstab_tpu_ckpt",
)
data_cfg = DataConfig(data_root=root, crop_size=(256, 256),
                      num_decode_threads=4)
ds = DeepStabDataset(data_cfg, model_cfg.temporal_window)
it = batch_iterator(ds, train_cfg.batch_size, seed=0)

t0 = time.time()
state = train(model_cfg, train_cfg, it, max_steps=300,
              log_fn=lambda m: print(json.dumps(m), flush=True))
print(f"trained 300 steps in {time.time()-t0:.0f}s", flush=True)

stable, unstable = synthetic_pair_clip(48, 320, 448, seed=999, shake_px=7.0)
clip_u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
stab = Stabilizer(model_cfg, PipelineConfig(batch_windows=8),
                  params=state.g_params)
out, flows = stab.stabilize_frames(clip_u8)
out_f = out.astype(np.float32) / 127.5 - 1.0
rep = stability_report(out_f, unstable)
rep["gt_stable_score"] = stability_report(stable)["stability_score"]
rep["mean_abs_flow_px"] = float(np.abs(flows).mean() * 352)
print("EVAL " + json.dumps({k: round(float(v), 4) for k, v in rep.items()}),
      flush=True)
print("DONE", flush=True)
