"""Round-3 end-to-end TPU training demo exercising the new features:
on-disk synthetic DeepStab pairs -> threaded uint8 loader -> async
train loop with generator-EMA + periodic held-out eval hook + TB event
writer -> eval with raw vs EMA weights."""
import glob
import json
import shutil
import time

import numpy as np

from pwstablenet_tpu.config import (
    DataConfig, ModelConfig, PipelineConfig, TrainConfig,
)
from pwstablenet_tpu.data.deepstab import (
    DeepStabDataset, batch_iterator, write_synthetic_deepstab,
)
from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
from pwstablenet_tpu.eval import stability_report
from pwstablenet_tpu.eval.hooks import make_clip_eval_hook
from pwstablenet_tpu.pipeline import Stabilizer
from pwstablenet_tpu.train.loop import train
from pwstablenet_tpu.train.state import generator_params
from pwstablenet_tpu.utils.tb_writer import read_event_file

root = "/tmp/deepstab_r3do"
shutil.rmtree(root, ignore_errors=True)
shutil.rmtree("/tmp/deepstab_r3do_ckpt", ignore_errors=True)
shutil.rmtree("/tmp/deepstab_r3do_tb", ignore_errors=True)
print("writing dataset...", flush=True)
write_synthetic_deepstab(root, num_pairs=12, frames=80, height=320,
                         width=448, seed=5)

model_cfg = ModelConfig(use_dropout=True)  # + pix2pix dropout
STEPS = 1000
train_cfg = TrainConfig(
    batch_size=8, num_epochs=1, steps_per_epoch=STEPS, w_feature=1.0,
    log_every=50, checkpoint_every=500,
    checkpoint_dir="/tmp/deepstab_r3do_ckpt",
    ema_decay=0.995, eval_every=250,
    tb_log_dir="/tmp/deepstab_r3do_tb",
)
data_cfg = DataConfig(data_root=root, crop_size=(256, 256),
                      num_decode_threads=4)
ds = DeepStabDataset(data_cfg, model_cfg.temporal_window)
it = batch_iterator(ds, train_cfg.batch_size, seed=0)

# held-out eval clip for the periodic hook
stable, unstable = synthetic_pair_clip(32, 320, 448, seed=999, shake_px=7.0)
clip_u8 = np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)
hook = make_clip_eval_hook(
    model_cfg, clip_u8, stable_clip=stable, batch_windows=8
)

t0 = time.time()
state = train(model_cfg, train_cfg, it, max_steps=STEPS,
              log_fn=lambda m: print(json.dumps(m), flush=True),
              eval_fn=hook)
print(f"trained {STEPS} steps in {time.time()-t0:.0f}s", flush=True)

# TB event file sanity
ev_files = glob.glob("/tmp/deepstab_r3do_tb/events.out.tfevents.*")
events = read_event_file(ev_files[0])
n_scalar = sum(1 for e in events if "scalars" in e)
print(f"TB events written: {len(ev_files)} file(s), "
      f"{n_scalar} scalar events", flush=True)

# final eval: raw vs EMA generator weights on a FRESH held-out clip
stable2, unstable2 = synthetic_pair_clip(48, 320, 448, seed=1234,
                                         shake_px=7.0)
clip2 = np.clip((unstable2 + 1) * 127.5, 0, 255).round().astype(np.uint8)
for label, params in (
    ("raw", generator_params(state, prefer_ema=False)),
    ("ema", generator_params(state)),
):
    stab = Stabilizer(model_cfg, PipelineConfig(batch_windows=8),
                      params=params)
    out, flows = stab.stabilize_frames(clip2)
    out_f = out.astype(np.float32) / 127.5 - 1.0
    rep = stability_report(out_f, unstable2)
    rep["mean_abs_flow_px"] = float(np.abs(np.asarray(flows)).mean() * 352)
    print(f"EVAL[{label}] " + json.dumps(
        {k: round(float(v), 4) for k, v in rep.items()}), flush=True)
print("unstable baseline stability: "
      f"{stability_report(unstable2)['stability_score']:.4f}  "
      f"gt stable: {stability_report(stable2)['stability_score']:.4f}",
      flush=True)
print("DONE", flush=True)
