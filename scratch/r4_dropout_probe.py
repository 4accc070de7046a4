"""Round-2 probe: bisect the use_dropout=True compile wedge.

Round-1 finding (commit e068432): the full train step with
ModelConfig.use_dropout=True sat in TPU compile for 36 min (normal cold
compile ~10 min) and was killed.  Suspect: per-UpBlock nn.Dropout rng
plumbing (threefry fold_in chains exploding the HLO).

This probe times trace+lower+compile of the train step across
(num_levels, resolution, dropout on/off, backend) so the blowup can be
localized.  Usage:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scratch/r4_dropout_probe.py cpu
  scratch/tpu_run.sh 1800 scratch/r4_dropout_probe.py tpu
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.train import create_train_state, make_train_step
from pwstablenet_tpu.data import make_train_batch


def probe(levels, res, dropout, steps_timeout=None):
    cfg = ModelConfig(
        num_levels=levels,
        model_resolution=(res, res),
        use_dropout=dropout,
        compute_dtype="bfloat16",
    )
    tcfg = TrainConfig(batch_size=2)
    t0 = time.perf_counter()
    state, (gen, disc, feat) = create_train_state(
        cfg, tcfg, jax.random.PRNGKey(0)
    )
    t_init = time.perf_counter() - t0
    step = make_train_step(cfg, tcfg, gen, disc, feat)
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_train_batch(2, res, res, cfg.temporal_window)
    )
    t0 = time.perf_counter()
    lowered = jax.jit(step).lower(state, batch)
    t_lower = time.perf_counter() - t0
    hlo_lines = len(lowered.as_text().splitlines())
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(
        f"levels={levels} res={res} dropout={dropout}: "
        f"init={t_init:.1f}s lower={t_lower:.1f}s "
        f"hlo_lines={hlo_lines} compile={t_compile:.1f}s",
        flush=True,
    )
    return compiled


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    print("devices:", jax.devices(), flush=True)
    if mode == "cpu":
        cases = [
            (5, 64, False), (5, 64, True),
            (6, 128, False), (6, 128, True),
            (8, 256, False), (8, 256, True),
        ]
    else:
        cases = [(8, 256, False), (8, 256, True)]
    for levels, res, dropout in cases:
        probe(levels, res, dropout)
