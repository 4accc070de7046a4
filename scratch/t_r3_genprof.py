"""Per-op device profile of the generator forward (and the full chunk
step) — which fusions actually burn the 11.3 ms at b16 256x256?"""
import glob
import gzip
import json
import sys
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.pipeline import Stabilizer


def op_totals(td):
    files = glob.glob(td + "/**/perfetto_trace.json.gz", recursive=True)
    events = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
    device_pids = {
        e.get("pid")
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "/device:" in str(e.get("args", {}).get("name", ""))
    }
    threads = {}
    for e in events:
        if (
            e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("pid") in device_pids
        ):
            threads[(e["pid"], e["tid"])] = e["args"]["name"]
    totals = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            tname = threads.get((e.get("pid"), e.get("tid")))
            if tname and "Ops" in tname:
                key = e.get("name", "?")
                totals[key] = totals.get(key, 0.0) + e["dur"] / 1e3
    return totals


def profile(fn, args, label, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td, create_perfetto_trace=True)
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        totals = op_totals(td)
    print(f"\n==== {label} (per call, ms) ====")
    tot = sum(totals.values()) / iters
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms/iters:8.3f}  {name[:100]}")
    print(f"  total op time: {tot:.2f} ms")


rng = np.random.default_rng(0)
cfg = ModelConfig()
n = 16
stab = Stabilizer(cfg, PipelineConfig(batch_windows=n))
T = cfg.temporal_window
mh, mw = cfg.model_resolution

stacks = jnp.asarray(
    rng.standard_normal((n, mh, mw, cfg.stack_channels)).astype(np.float32)
)
gfwd = jax.jit(stab.model.apply)
profile(lambda: gfwd(stab.params, stacks), (), "generator fwd b16")

frames = jnp.asarray(rng.integers(0, 256, (n + T - 1, 720, 1280, 3), np.uint8))
up = stab._pallas_ok(frames.shape)
profile(
    lambda: stab._chunk_step(stab.params, frames, up), (),
    "chunk16 720p step",
)
