"""Benchmark suite (BASELINE.json configs; SURVEY.md section 6).

Prints ONE JSON line to stdout:
    {"metric": "720p stabilized frames/sec/chip", "value": N,
     "unit": "frames/sec/chip", "vs_baseline": N/200}

Details (all configs, parity checks, breakdowns) go to stderr.

Methodology: device time is measured from the profiler's device track
(``pwstablenet_tpu.utils.timing.device_time``) — in this environment the
TPU sits behind a tunnel with ~100 ms per-dispatch latency, so
wall-clock loops measure the tunnel, not the chip.  Wall-clock streaming
numbers are also reported to stderr for honesty.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    from pwstablenet_tpu.config import ModelConfig, PipelineConfig
    from pwstablenet_tpu.ops import grid_sample
    from pwstablenet_tpu.ops.warp import flow_to_grid
    from pwstablenet_tpu.pipeline import Stabilizer
    from pwstablenet_tpu.utils.timing import device_time

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")
    on_tpu = backend == "tpu"

    rng = np.random.default_rng(0)
    results = {}

    # ---- parity gate: Pallas kernel vs XLA oracle (warp-map MSE) ----
    if on_tpu:
        from pwstablenet_tpu.kernels.grid_sample_pallas import (
            grid_sample_pallas,
        )

        img = jnp.asarray(rng.random((2, 64, 256, 3), np.float32))
        lf = (rng.random((2, 8, 8, 2), np.float32) - 0.5) * 0.15
        flow = jax.image.resize(jnp.asarray(lf), (2, 64, 256, 2), "bilinear")
        grid = flow_to_grid(flow)
        ref = grid_sample(img, grid)
        out = grid_sample_pallas(img, grid)
        mse = float(jnp.mean((out - ref) ** 2))
        results["pallas_vs_oracle_mse"] = mse
        log(f"pallas kernel parity MSE: {mse:.3e} (gate: <=1e-6)")

        # gradient kernel vs XLA autodiff (custom-VJP backward)
        from pwstablenet_tpu.kernels.grid_sample_pallas import (
            grid_sample_grad_pallas,
        )

        ct = jnp.asarray(rng.standard_normal(img.shape).astype(np.float32))
        expected = jax.grad(
            lambda g: jnp.sum(ct * grid_sample(img, g))
        )(grid)
        got = grid_sample_grad_pallas(img, grid, ct)
        gmse = float(jnp.mean((got - expected) ** 2))
        results["pallas_grad_vs_autodiff_mse"] = gmse
        log(f"pallas grad kernel parity MSE: {gmse:.3e} (gate: <=1e-6)")
        mse = max(mse, gmse)
        if mse > 1e-6:
            log("PARITY FAILURE — refusing to report performance")
            print(json.dumps({
                "metric": "720p stabilized frames/sec/chip",
                "value": 0.0, "unit": "frames/sec/chip",
                "vs_baseline": 0.0, "error": "pallas parity failure",
            }))
            return 1

    # ---- config 3: end-to-end 720p device path ----
    model_cfg = ModelConfig()
    pipe_cfg = PipelineConfig(batch_windows=8)
    stab = Stabilizer(model_cfg, pipe_cfg)
    T = model_cfg.temporal_window
    n = pipe_cfg.batch_windows
    frames_720 = jnp.asarray(
        rng.random((n + T - 1, 720, 1280, 3), np.float32) * 2 - 1
    )
    use_pallas = stab._pallas_ok(frames_720.shape)
    log(f"720p chunk: {frames_720.shape}, pallas warp: {use_pallas}")

    step = stab._chunk_step
    dt = device_time(
        lambda f: step(stab.params, f, use_pallas), (frames_720,), iters=10
    )
    fps_720 = n / dt
    results["fps_720p_device"] = fps_720
    log(f"config 3 (720p e2e device path): {dt*1e3:.2f} ms/chunk{n} "
        f"= {fps_720:.0f} frames/sec/chip")

    # ---- config 2: 2-stage cascade on a 30-frame 480p clip ----
    clip = rng.random((30, 480, 832, 3)).astype(np.float32) * 2 - 1
    out, flows = stab.stabilize_frames(clip)  # warm-up: compile all shapes
    assert out.shape == clip.shape and flows.shape[0] == 30
    t0 = time.perf_counter()
    out, flows = stab.stabilize_frames(clip)
    wall = time.perf_counter() - t0
    results["fps_480p_wall"] = 30 / wall
    log(f"config 2 (30-frame 480p clip, wall-clock incl host+link): "
        f"{wall:.2f}s = {30/wall:.1f} fps")

    # ---- config 5 (partial): streaming 1080p device path ----
    frames_1080 = jnp.asarray(
        rng.random((n + T - 1, 1080, 1920, 3), np.float32) * 2 - 1
    )
    use_pallas_1080 = stab._pallas_ok(frames_1080.shape)
    dt1080 = device_time(
        lambda f: step(stab.params, f, use_pallas_1080),
        (frames_1080,), iters=5,
    )
    results["fps_1080p_device"] = n / dt1080
    log(f"config 5 (1080p streaming device path): {dt1080*1e3:.2f} ms"
        f"/chunk{n} = {n/dt1080:.0f} frames/sec/chip "
        f"(pallas: {use_pallas_1080})")

    # ---- config 4: adversarial train step on DeepStab-like crops ----
    from pwstablenet_tpu.config import TrainConfig
    from pwstablenet_tpu.data import make_train_batch
    from pwstablenet_tpu.train import create_train_state, make_train_step

    train_cfg = TrainConfig(batch_size=4)
    state, (gen, disc, feat) = create_train_state(
        model_cfg, train_cfg, jax.random.PRNGKey(0)
    )
    t_step = jax.jit(make_train_step(model_cfg, train_cfg, gen, disc, feat))
    batch = jax.tree_util.tree_map(
        jnp.asarray,
        make_train_batch(4, 256, 256, model_cfg.temporal_window),
    )
    dts = device_time(lambda b: t_step(state, b)[1], (batch,), iters=5)
    results["train_step_ms"] = dts * 1e3
    log(f"config 4 (adversarial train step, b4x2 256x256): "
        f"{dts*1e3:.1f} ms/step = {8/dts:.1f} samples/s")

    # ---- headline ----
    headline = {
        "metric": "720p stabilized frames/sec/chip",
        "value": round(fps_720, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps_720 / 200.0, 3),
        "detail": {k: round(v, 3) for k, v in results.items()},
    }
    print(json.dumps(headline))
    return 0


if __name__ == "__main__":
    sys.exit(main())
