"""Benchmark suite (BASELINE.json configs; SURVEY.md section 6).

Prints ONE JSON line to stdout:
    {"metric": "720p stabilized frames/sec/chip", "value": N,
     "unit": "frames/sec/chip", "vs_baseline": N/200}

Details (all configs, parity checks, breakdowns, MFU) go to stderr.

Methodology: device time is measured from the profiler's device track
(``pwstablenet_tpu.utils.timing.device_time``) — in this environment the
TPU sits behind a tunnel with ~100 ms per-dispatch latency, so
wall-clock loops measure the tunnel, not the chip.  Wall-clock streaming
numbers are also reported (with an H2D/compute/D2H decomposition) for
honesty.  Frames cross the link as uint8 (ops/pixels transport format).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

V5E_BF16_PEAK_FLOPS = 197e12  # per chip


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _warp_flops(frames: int, h: int, w: int, c: int = 3,
                backward: bool = False) -> float:
    """Analytic flops of the fused Pallas warp (XLA's cost model sees
    the kernel as opaque/zero-flop, under-reporting MFU).

    Statically derivable tap arithmetic per output pixel: ~15 flops of
    coordinate denormalization + corner/weight math, plus a 4-tap
    bilerp (4 mul + 3 add = 7 flops) per channel.  The backward (flow
    gradient) kernel re-does the tap math and accumulates 2-channel
    grads — counted as 2x the forward on top of it."""
    f = float(frames) * h * w * (15 + 7 * c)
    return f * 3.0 if backward else f


def _quantize(x):
    return np.clip((x + 1.0) * 127.5, 0, 255).round().astype(np.uint8)


def _parity_gates(rng, results) -> float:
    """Pallas kernel vs XLA oracle on device; returns worst MSE."""
    from pwstablenet_tpu.kernels.grid_sample_pallas import (
        grid_sample_grad_pallas,
        grid_sample_pallas,
        grid_sample_pallas_padded,
    )
    from pwstablenet_tpu.ops import grid_sample
    from pwstablenet_tpu.ops.warp import flow_to_grid

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
    ct = jnp.asarray(rng.standard_normal(img.shape).astype(np.float32))
    expected = jax.grad(lambda g: jnp.sum(ct * grid_sample(img, g)))(grid)
    got = grid_sample_grad_pallas(img, grid, ct)
    gmse = float(jnp.mean((got - expected) ** 2))
    results["pallas_grad_vs_autodiff_mse"] = gmse
    log(f"pallas grad kernel parity MSE: {gmse:.3e} (gate: <=1e-6)")

    # padded-geometry wrapper at a video-like off-lane width (832-style)
    imgp = jnp.asarray(rng.random((1, 64, 208, 3), np.float32))
    lfp = (rng.random((1, 8, 8, 2), np.float32) - 0.5) * 0.15
    flowp = jax.image.resize(jnp.asarray(lfp), (1, 64, 208, 2), "bilinear")
    gridp = flow_to_grid(flowp)
    refp = grid_sample(imgp, gridp)
    outp = grid_sample_pallas_padded(imgp, gridp)
    pmse = float(jnp.mean((outp - refp) ** 2))
    results["pallas_padded_vs_oracle_mse"] = pmse
    log(f"pallas padded-width parity MSE: {pmse:.3e} (gate: <=1e-6)")

    # packed-uint8 path: +-1 output code allowed (quantized rounding)
    from pwstablenet_tpu.kernels.grid_sample_pallas import (
        grid_sample_pallas_packed,
    )

    img_u8 = rng.integers(0, 256, (2, 64, 256, 3), np.uint8)
    imgf = jnp.asarray(img_u8).astype(jnp.float32) / 127.5 - 1.0
    ref8 = np.clip(
        (np.asarray(grid_sample(imgf, grid)) + 1.0) * 127.5, 0, 255
    ).round().astype(np.int16)
    out8 = grid_sample_pallas_packed(jnp.asarray(img_u8), grid)
    codediff = int(
        np.abs(np.asarray(out8).astype(np.int16) - ref8).max()
    )
    results["pallas_packed_max_code_diff"] = codediff
    log(f"pallas packed-uint8 parity: max code diff {codediff} (gate: <=1)")
    if codediff > 1:
        return 1.0  # force the parity-failure path
    return max(mse, gmse, pmse)


def main() -> int:
    from pwstablenet_tpu.config import ModelConfig, PipelineConfig
    from pwstablenet_tpu.pipeline import Stabilizer
    from pwstablenet_tpu.utils.timing import device_time

    # Backend init can HANG (not error) when the remote-attached TPU's
    # tunnel is down — the block sits in native code, so in-process
    # SIGALRM never fires (measured round 5: the relay daemon died
    # mid-round and every device op blocked forever, through a 400s
    # alarm).  Pre-flight in a KILLABLE subprocess instead.
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "jnp.ones((8, 8)).sum().block_until_ready();"
             "print('OK')"],
            timeout=300, capture_output=True, text=True,
        )
        if "OK" not in probe.stdout:
            log("device preflight failed:\n" + probe.stderr[-2000:])
            return 1
    except subprocess.TimeoutExpired:
        log("device preflight exceeded 300s — the TPU link is down "
            "(no relay listener?); bench refuses to hang")
        return 1

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")
    on_tpu = backend == "tpu"

    rng = np.random.default_rng(0)
    results = {}

    if on_tpu:
        worst = _parity_gates(rng, results)
        if worst > 1e-6:
            log("PARITY FAILURE — refusing to report performance")
            print(json.dumps({
                "metric": "720p stabilized frames/sec/chip",
                "value": 0.0, "unit": "frames/sec/chip",
                "vs_baseline": 0.0, "error": "pallas parity failure",
            }))
            return 1

    # ---- config 3: end-to-end 720p device path (+ MFU) ----
    model_cfg = ModelConfig()
    pipe_cfg = PipelineConfig(batch_windows=8)
    stab = Stabilizer(model_cfg, pipe_cfg)
    T = model_cfg.temporal_window
    n = pipe_cfg.batch_windows
    frames_720 = jnp.asarray(
        _quantize(rng.random((n + T - 1, 720, 1280, 3), np.float32) * 2 - 1)
    )
    use_pallas = stab._pallas_ok(frames_720.shape)
    log(f"720p chunk: {frames_720.shape} uint8, pallas warp: {use_pallas}")

    step = stab._chunk_step
    dt = device_time(
        lambda f: step(stab.params, f, use_pallas), (frames_720,), iters=10
    )
    results["fps_720p_device_n8"] = n / dt
    log(f"config 3 (720p e2e device path): {dt*1e3:.2f} ms/chunk{n} "
        f"= {n/dt:.0f} frames/sec/chip")

    # throughput config: 16 windows/chunk amortizes the UNet's small
    # deep levels over a fuller MXU (saturates by n=32 at ~same fps)
    stab16 = Stabilizer(
        model_cfg, PipelineConfig(batch_windows=16), params=stab.params
    )
    frames_720_16 = jnp.asarray(
        _quantize(rng.random((16 + T - 1, 720, 1280, 3), np.float32) * 2 - 1)
    )
    dt16 = device_time(
        lambda f: stab16._chunk_step(stab16.params, f, use_pallas),
        (frames_720_16,), iters=8,
    )
    fps_720 = 16 / dt16
    results["fps_720p_device"] = fps_720
    log(f"config 3 (720p e2e, 16-window chunks): {dt16*1e3:.2f} ms/chunk16 "
        f"= {fps_720:.0f} frames/sec/chip")

    # MFU estimate: analytic module flops / device time / bf16 peak
    try:
        cost = (
            step.lower(stab.params, frames_720, use_pallas=use_pallas)
            .compile()
            .cost_analysis()
        )
        flops = float((cost or {}).get("flops", 0.0))
        if flops > 0 and on_tpu:
            # add the Pallas warp's tap arithmetic (one packed warp of
            # n frames at full resolution), which the XLA cost model
            # can't see inside the custom call
            wf = _warp_flops(n, 720, 1280) if use_pallas else 0.0
            flops += wf
            mfu = flops / dt / V5E_BF16_PEAK_FLOPS
            results["mfu_720p"] = mfu
            results["gflops_per_chunk_720p"] = flops / 1e9
            log(f"config 3 MFU: {100*mfu:.1f}% of v5e bf16 peak "
                f"({flops/1e9:.1f} GFLOP/chunk{n}, XLA cost model + "
                f"{wf/1e9:.2f} GFLOP analytic warp taps)")
    except Exception as e:  # cost model availability varies by backend
        log(f"MFU estimate unavailable: {e}")

    # generator-only MFU (the chunk number is skewed by the warp kernel,
    # which is gather-bound with ~zero FLOPs in XLA's cost model)
    try:
        mh, mw = model_cfg.model_resolution
        xg = jnp.asarray(
            rng.standard_normal((n, mh, mw, model_cfg.stack_channels))
            .astype(np.float32)
        )
        gfwd = jax.jit(stab.model.apply)
        dtg = device_time(lambda p, x: gfwd(p, x), (stab.params, xg), iters=10)
        gcost = gfwd.lower(stab.params, xg).compile().cost_analysis()
        gflops = float((gcost or {}).get("flops", 0.0))
        if gflops > 0 and on_tpu:
            gmfu = gflops / dtg / V5E_BF16_PEAK_FLOPS
            results["mfu_generator"] = gmfu
            log(f"generator fwd (b{n} {mh}x{mw}): {dtg*1e3:.2f} ms, "
                f"MFU {100*gmfu:.1f}%")
    except Exception as e:
        log(f"generator MFU unavailable: {e}")

    # ---- config 2: 2-stage cascade on a 30-frame 480p clip ----
    # uint8 transport both ways; wall-clock includes host + tunnel link.
    clip = _quantize(rng.random((30, 480, 832, 3)) * 2 - 1)
    out, flows = stab.stabilize_frames(clip)  # warm-up: compile all shapes
    assert out.shape == clip.shape and out.dtype == np.uint8
    assert flows.shape[0] == 30
    t0 = time.perf_counter()
    out, flows = stab.stabilize_frames(clip)
    wall = time.perf_counter() - t0
    results["fps_480p_wall"] = 30 / wall
    log(f"config 2 (30-frame 480p clip, wall-clock incl host+link): "
        f"{wall:.2f}s = {30/wall:.1f} fps")

    # decode-inclusive file path (SURVEY §4.2: decode vs H2D vs compute
    # breakdown): stream the same clip from disk through the native
    # decoder -> device -> encoder
    import os
    import tempfile

    from pwstablenet_tpu.data import video_io

    with tempfile.TemporaryDirectory(prefix="pwstable_bench_") as td:
        inp = os.path.join(td, "in.avi")
        outp = os.path.join(td, "out.avi")
        video_io.write_video(inp, clip, 30.0)
        t0 = time.perf_counter()
        r = stab.stabilize_video(inp, outp)
        wall_file = time.perf_counter() - t0
        results["fps_480p_file_wall"] = r["frames"] / wall_file
        log(f"config 2 (file->file incl. decode+encode): "
            f"{wall_file:.2f}s = {r['frames']/wall_file:.1f} fps")

    # decomposition of one chunk's phases (serial; the pipeline overlaps
    # them via its bounded in-flight queue)
    chunk = clip[: n + T - 1]
    up = stab._pallas_ok(chunk.shape)
    t0 = time.perf_counter()
    dev_chunk = jax.block_until_ready(jnp.asarray(chunk))
    h2d = time.perf_counter() - t0
    comp = device_time(
        lambda f: step(stab.params, f, up), (dev_chunk,), iters=5
    )
    s_dev, f_dev = step(stab.params, dev_chunk, up)
    jax.block_until_ready((s_dev, f_dev))
    t0 = time.perf_counter()
    _ = np.asarray(s_dev), np.asarray(f_dev)
    d2h = time.perf_counter() - t0
    results["chunk480_h2d_ms"] = h2d * 1e3
    results["chunk480_compute_ms"] = comp * 1e3
    results["chunk480_d2h_ms"] = d2h * 1e3
    log(f"config 2 breakdown per chunk{n} (serial; streaming overlaps): "
        f"H2D {h2d*1e3:.0f} ms, device {comp*1e3:.1f} ms, "
        f"D2H {d2h*1e3:.0f} ms (pallas: {up})")

    # ---- config 5 (inference half): streaming 1080p device path ----
    # 16-window chunks: same throughput methodology as the 720p
    # headline (deep UNet levels amortize over a fuller MXU)
    n16 = 16
    step16 = stab16._chunk_step
    frames_1080 = jnp.asarray(
        _quantize(
            rng.random((n16 + T - 1, 1080, 1920, 3), np.float32) * 2 - 1
        )
    )
    use_pallas_1080 = stab16._pallas_ok(frames_1080.shape)
    dt1080 = device_time(
        lambda f: step16(stab16.params, f, use_pallas_1080),
        (frames_1080,), iters=5,
    )
    results["fps_1080p_device"] = n16 / dt1080
    log(f"config 5 (1080p streaming device path): {dt1080*1e3:.2f} ms"
        f"/chunk{n16} = {n16/dt1080:.0f} frames/sec/chip "
        f"(pallas: {use_pallas_1080})")

    # capability headroom: 4K (2160x3840) single-chip device path
    frames_4k = jnp.asarray(
        (rng.integers(0, 256, (n16 + T - 1, 2160, 3840, 3))).astype(
            np.uint8
        )
    )
    use_pallas_4k = stab16._pallas_ok(frames_4k.shape)
    dt4k = device_time(
        lambda f: step16(stab16.params, f, use_pallas_4k),
        (frames_4k,), iters=3,
    )
    results["fps_4k_device"] = n16 / dt4k
    log(f"4K device path: {dt4k*1e3:.2f} ms/chunk{n16} "
        f"= {n16/dt4k:.0f} frames/sec/chip (pallas: {use_pallas_4k})")

    # ---- causal live-mode latency (VERDICT r2 item 3) ----
    # The zero-lookahead mode (temporal_center = T-1) exists for live
    # streaming; the number it optimizes is per-frame latency, not
    # throughput: device time of a chunk-1 step at 720p (plus chunk-4,
    # the latency/throughput middle ground).
    import dataclasses as _dc

    causal_cfg = _dc.replace(
        model_cfg, temporal_center=model_cfg.temporal_window - 1
    )
    for nlat in (1, 4):
        stab_c = Stabilizer(
            causal_cfg, PipelineConfig(batch_windows=nlat),
            params=stab.params,
        )
        frames_c = jnp.asarray(
            _quantize(
                rng.random((nlat + T - 1, 720, 1280, 3), np.float32) * 2 - 1
            )
        )
        up_c = stab_c._pallas_ok(frames_c.shape)
        step_c = stab_c._chunk_step
        dtc = device_time(
            lambda f: step_c(stab_c.params, f, up_c), (frames_c,), iters=10
        )
        results[f"causal_720p_ms_per_frame_chunk{nlat}"] = dtc / nlat * 1e3
        log(f"causal live mode (zero lookahead), 720p chunk{nlat}: "
            f"{dtc*1e3:.2f} ms/step = {dtc/nlat*1e3:.2f} ms/frame device "
            f"latency ({nlat/dtc:.0f} fps, pallas: {up_c})")

    # ---- configs 4 + 5 (training half): adversarial train step through
    # the data-parallel path (mesh engaged; on one chip the trivial mesh
    # IS the plain step, on the 8-way CPU mesh it exercises the
    # collective path) ----
    from pwstablenet_tpu.config import TrainConfig
    from pwstablenet_tpu.data import make_train_batch
    from pwstablenet_tpu.parallel import (
        data_parallel_step,
        make_mesh_for_batch,
        replicate_tree,
        shard_batch,
    )
    from pwstablenet_tpu.train import create_train_state, make_train_step

    train_cfg = TrainConfig(batch_size=4)
    mesh = make_mesh_for_batch(train_cfg.batch_size)
    state, (gen, disc, feat) = create_train_state(
        model_cfg, train_cfg, jax.random.PRNGKey(0)
    )
    dp_step = data_parallel_step(
        make_train_step(model_cfg, train_cfg, gen, disc, feat), mesh
    )
    state = replicate_tree(state, mesh)
    batch = shard_batch(
        make_train_batch(4, 256, 256, model_cfg.temporal_window), mesh
    )

    # donation-safe chaining: the step consumes its input state
    state_box = [state]

    def chained(b):
        state_box[0], metrics = dp_step(state_box[0], b)
        return metrics

    dts = device_time(chained, (batch,), iters=5)
    results["train_step_ms"] = dts * 1e3
    results["train_step_dp_ms"] = dts * 1e3
    results["train_mesh_devices"] = mesh.size
    log(f"config 4/5 (adversarial train step, DP mesh x{mesh.size}, "
        f"b4x2 256x256 uint8): {dts*1e3:.1f} ms/step "
        f"= {8/dts/mesh.size:.1f} samples/s/chip (device)")

    # train-step MFU (VERDICT r1 item 4): analytic XLA cost model flops
    # of the whole fused D+G module / device time / bf16 peak, plus the
    # Pallas warp kernels' analytic tap flops (the cost model sees the
    # custom calls as zero-flop): per step, each of the 2B fold-frames
    # is warped once per cascade stage at model resolution, forward +
    # flow-gradient VJP.
    try:
        tcost = (
            dp_step.lower(state_box[0], batch).compile().cost_analysis()
        )
        tflops = (tcost or {}).get("flops", 0.0)
        if tflops:
            mh, mw = model_cfg.model_resolution
            twf = _warp_flops(
                2 * train_cfg.batch_size * model_cfg.num_stages, mh, mw,
                backward=True,
            )
            tflops += twf
            tmfu = tflops / mesh.size / dts / V5E_BF16_PEAK_FLOPS
            results["train_mfu"] = tmfu
            results["train_gflops_per_step"] = tflops / mesh.size / 1e9
            log(f"config 4/5 train-step MFU: {100*tmfu:.1f}% of v5e "
                f"bf16 peak ({tflops/mesh.size/1e9:.0f} GFLOP/step/chip, "
                f"XLA cost model + {twf/1e9:.2f} GFLOP analytic warp "
                "taps fwd+vjp)")
    except Exception as e:  # noqa: BLE001 — cost model varies by backend
        log(f"train MFU unavailable: {e}")

    # ---- full-DEFAULT-config DP step (VERDICT r3 item 8): the exact
    # config the env-gated CPU-mesh test runs (8 levels, bf16 compute,
    # instance norm, dropout rngs, EMA, b8) measured on hardware at
    # every green bench, so the real config's SPMD path is exercised
    # regularly, not once per round behind PWSTABLE_RUN_SLOW (compiles
    # in ~31 s on TPU vs 2h51m on this 1-core CPU host — hence the gate)
    if on_tpu:
        try:
            import dataclasses as _dcd

            cfg_d = _dcd.replace(model_cfg, use_dropout=True)
            tcfg_d = TrainConfig(batch_size=8, ema_decay=0.995)
            state_d, (gen_d, disc_d, feat_d) = create_train_state(
                cfg_d, tcfg_d, jax.random.PRNGKey(1)
            )
            mesh_d = make_mesh_for_batch(tcfg_d.batch_size)
            dp_step_d = data_parallel_step(
                make_train_step(cfg_d, tcfg_d, gen_d, disc_d, feat_d),
                mesh_d,
            )
            state_d = replicate_tree(state_d, mesh_d)
            batch_d = shard_batch(
                make_train_batch(
                    tcfg_d.batch_size, 256, 256, cfg_d.temporal_window,
                    seed=9,
                ),
                mesh_d,
            )
            box_d = [state_d]

            def chained_d(b):
                box_d[0], m = dp_step_d(box_d[0], b)
                return m

            dtd = device_time(chained_d, (batch_d,), iters=5)
            assert box_d[0].g_ema is not None
            results["train_step_dp_default_ms"] = dtd * 1e3
            log(f"config 4/5 (FULL default config: dropout+EMA, b8 DP "
                f"mesh x{mesh_d.size}): {dtd*1e3:.1f} ms/step "
                f"= {tcfg_d.batch_size*2/dtd/mesh_d.size:.1f} "
                f"samples/s/chip")
        except Exception as e:  # noqa: BLE001 — must not kill the bench
            log(f"default-config DP step failed: {e}")

    # hot-loop wall overhead: async dispatch + uint8 H2D per step.
    # Batches are pre-generated so this isolates loop machinery + link
    # (in real training the loader's prefetch threads hide data-gen).
    steps = 15
    host_batches = [
        make_train_batch(4, 256, 256, model_cfg.temporal_window, seed=i + 1)
        for i in range(4)
    ]
    t0 = time.perf_counter()
    for i in range(steps):
        b = shard_batch(host_batches[i % len(host_batches)], mesh)
        state_box[0], metrics = dp_step(state_box[0], b)
    jax.block_until_ready(metrics)
    loop_wall = (time.perf_counter() - t0) / steps
    results["train_loop_wall_ms"] = loop_wall * 1e3
    log(f"config 5 train loop wall (loop machinery + uint8 H2D via "
        f"tunnel; data-gen excluded): {loop_wall*1e3:.0f} ms/step "
        f"({loop_wall/dts:.1f}x device time)")

    # loop machinery alone (device-resident batch, no per-step H2D):
    # the async host loop must pipeline dispatches at device speed —
    # this is the number that transfers to real (PCIe-attached) hosts,
    # where H2D of a 12 MB uint8 batch is ~1 ms, not ~700 ms of tunnel.
    t0 = time.perf_counter()
    for _ in range(steps):
        state_box[0], metrics = dp_step(state_box[0], batch)
    jax.block_until_ready(metrics)
    loop_dev = (time.perf_counter() - t0) / steps
    results["train_loop_wall_devdata_ms"] = loop_dev * 1e3
    log(f"config 5 train loop wall (device-resident data): "
        f"{loop_dev*1e3:.1f} ms/step ({loop_dev/dts:.2f}x device time)")

    # ---- headline ----
    headline = {
        "metric": "720p stabilized frames/sec/chip",
        "value": round(fps_720, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps_720 / 200.0, 3),
        "detail": {k: round(v, 4) for k, v in results.items()},
    }
    print(json.dumps(headline))
    return 0


if __name__ == "__main__":
    sys.exit(main())
