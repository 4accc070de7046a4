"""Multi-device data-parallel tests on the fake 8-device CPU mesh
(SURVEY.md section 4.2 "multi-device" tier): sharded-vs-single-device
step equivalence without a pod.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwstablenet_tpu.config import MeshConfig, ModelConfig, TrainConfig
from pwstablenet_tpu.data import make_train_batch
from pwstablenet_tpu.parallel import (
    data_parallel_step,
    make_mesh,
    replicate_tree,
    shard_batch,
)
from pwstablenet_tpu.train import create_train_state, make_train_step

TINY = ModelConfig(
    temporal_window=3,
    num_levels=3,
    base_features=8,
    max_features=16,
    model_resolution=(16, 16),
    num_stages=2,
    disc_num_layers=1,
    feat_channels=(8,),
    compute_dtype="float32",
)
TCFG = TrainConfig(batch_size=8, num_epochs=1, steps_per_epoch=4)


def test_mesh_has_8_devices():
    mesh = make_mesh(MeshConfig())
    assert mesh.devices.size == 8, "conftest must provide 8 CPU devices"


def test_sharded_step_matches_single_device():
    state, (gen, disc, feat) = create_train_state(
        TINY, TCFG, jax.random.PRNGKey(0)
    )
    step = make_train_step(TINY, TCFG, gen, disc, feat)
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_train_batch(8, 16, 16, TINY.temporal_window, seed=7)
    )

    # single-device reference
    ref_state, ref_metrics = jax.jit(step)(state, batch)

    # 8-way data parallel
    mesh = make_mesh()
    p_step = data_parallel_step(step, mesh)
    p_state = replicate_tree(state, mesh)
    p_batch = shard_batch(batch, mesh)
    out_state, out_metrics = p_step(p_state, p_batch)

    np.testing.assert_allclose(
        float(ref_metrics["loss_g"]), float(out_metrics["loss_g"]),
        rtol=2e-4,
    )
    np.testing.assert_allclose(
        float(ref_metrics["loss_d"]), float(out_metrics["loss_d"]),
        rtol=2e-4,
    )
    # updated params agree across the replicated mesh and match the
    # single-device update
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.g_params),
        jax.tree_util.tree_leaves(out_state.g_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_multi_step_sharded_run():
    state, (gen, disc, feat) = create_train_state(
        TINY, TCFG, jax.random.PRNGKey(1)
    )
    mesh = make_mesh()
    p_step = data_parallel_step(
        make_train_step(TINY, TCFG, gen, disc, feat), mesh
    )
    state = replicate_tree(state, mesh)
    for i in range(3):
        batch = shard_batch(
            jax.tree_util.tree_map(
                jnp.asarray,
                make_train_batch(8, 16, 16, TINY.temporal_window, seed=i),
            ),
            mesh,
        )
        state, metrics = p_step(state, batch)
        assert np.isfinite(float(metrics["loss_g"]))
    assert int(state.step) == 3


def test_sharded_convergence_over_20_steps():
    """Multi-step CONVERGENCE on the 8-device mesh (SURVEY section 4.2
    multi-device tier): the pixel term actually decreases — not just a
    finite-loss smoke run."""
    state, (gen, disc, feat) = create_train_state(
        TINY, TCFG, jax.random.PRNGKey(5)
    )
    mesh = make_mesh()
    p_step = data_parallel_step(
        make_train_step(TINY, TCFG, gen, disc, feat), mesh
    )
    state = replicate_tree(state, mesh)
    # small fixed dataset cycled (4 batches x 5 epochs): convergence on
    # it must be monotone-ish; fresh random batches at 20 steps are too
    # noisy to assert a decrease on
    batches = [
        jax.tree_util.tree_map(
            jnp.asarray,
            make_train_batch(8, 16, 16, TINY.temporal_window, seed=100 + i),
        )
        for i in range(4)
    ]
    pixels = []
    for i in range(20):
        state, metrics = p_step(state, shard_batch(batches[i % 4], mesh))
        pixels.append(float(metrics["pixel"]))
    assert int(state.step) == 20
    assert all(np.isfinite(p) for p in pixels)
    first, last = np.mean(pixels[:4]), np.mean(pixels[-4:])
    assert last < first, f"pixel loss did not decrease: {first} -> {last}"


def test_grad_accum_under_data_parallel_matches():
    """grad_accum x DP interaction: micro-batch accumulation inside each
    shard + cross-device gradient mean == the plain DP step on the same
    global batch (means of means over equal-sized groups)."""
    import dataclasses

    cfg_plain = TCFG
    cfg_accum = dataclasses.replace(TCFG, grad_accum_steps=2)
    state, (gen, disc, feat) = create_train_state(
        TINY, cfg_plain, jax.random.PRNGKey(6)
    )
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_train_batch(8, 16, 16, TINY.temporal_window, seed=21)
    )
    mesh = make_mesh()

    p_plain = data_parallel_step(
        make_train_step(TINY, cfg_plain, gen, disc, feat), mesh
    )
    p_accum = data_parallel_step(
        make_train_step(TINY, cfg_accum, gen, disc, feat), mesh
    )
    # host-side snapshot: device_put may ALIAS existing device buffers
    # into the replicated array, and the DP step donates its input — a
    # second replicate_tree(state) would then see deleted buffers
    host_state = jax.tree_util.tree_map(np.asarray, state)
    s1, m1 = p_plain(
        replicate_tree(host_state, mesh), shard_batch(batch, mesh)
    )
    s2, m2 = p_accum(
        replicate_tree(host_state, mesh), shard_batch(batch, mesh)
    )
    np.testing.assert_allclose(
        float(m1["loss_d"]), float(m2["loss_d"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m1["loss_g"]), float(m2["loss_g"]), rtol=1e-3
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.g_params),
        jax.tree_util.tree_leaves(s2.g_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2.5 * TCFG.lr_g
        )


def test_batchnorm_uses_global_batch_stats_under_sharding():
    """blocks.py's BatchNorm claims SPMD turns the batch mean into a
    cross-device collective (global-batch statistics).  Verify: a
    batch whose per-sample statistics differ wildly produces the SAME
    output sharded as unsharded — per-device (local) stats would not."""
    import dataclasses as dc

    from jax.sharding import NamedSharding, PartitionSpec

    from pwstablenet_tpu.models import CascadedGenerator

    cfg = dc.replace(TINY, norm="batch", num_stages=1)
    gen = CascadedGenerator(cfg)
    rng = np.random.default_rng(0)
    # per-sample offsets/scales spread across devices: local stats
    # differ from global stats by construction
    x = rng.standard_normal((8, 16, 16, cfg.stack_channels)).astype(np.float32)
    x += np.arange(8, dtype=np.float32)[:, None, None, None] * 2.0
    x *= (1.0 + np.arange(8, dtype=np.float32) / 4.0)[:, None, None, None]
    import flax

    params = flax.core.unfreeze(gen.init(jax.random.PRNGKey(0), jnp.asarray(x)))
    # the warp head is zero-init (identity warp) — randomize it so the
    # flows actually depend on the normalized activations
    head = params["params"]["stage0"]["head"]
    head["kernel"] = jnp.asarray(
        rng.standard_normal(head["kernel"].shape).astype(np.float32) * 0.05
    )

    ref = jax.jit(gen.apply)(params, jnp.asarray(x))[0]
    assert float(jnp.abs(ref).max()) > 1e-4  # nontrivial output

    mesh = make_mesh()
    shard = NamedSharding(mesh, PartitionSpec("data"))
    rep = NamedSharding(mesh, PartitionSpec())
    sharded_apply = jax.jit(
        lambda p, xx: gen.apply(p, xx)[0],
        in_shardings=(rep, shard),
        out_shardings=rep,
    )
    out = sharded_apply(
        jax.device_put(params, rep), jax.device_put(jnp.asarray(x), shard)
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_clip_sharded_inference_matches_single_device():
    """Clip-sharded inference (SURVEY.md section 5.7): window batches
    sharded over the mesh produce identical stabilized output."""
    from pwstablenet_tpu.config import PipelineConfig
    from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
    from pwstablenet_tpu.pipeline import Stabilizer

    cfg = ModelConfig(
        temporal_window=3,
        num_levels=4,
        base_features=8,
        max_features=16,
        model_resolution=(32, 32),
        num_stages=2,
        compute_dtype="float32",
    )
    _, clip = synthetic_pair_clip(16, 48, 64, seed=11)

    single = Stabilizer(cfg, PipelineConfig(batch_windows=8))
    out_s, flow_s = single.stabilize_frames(clip)

    mesh = make_mesh()
    sharded = Stabilizer(
        cfg, PipelineConfig(batch_windows=8),
        params=single.params, mesh=mesh,
    )
    out_m, flow_m = sharded.stabilize_frames(clip)
    np.testing.assert_allclose(out_m, out_s, atol=1e-5)
    np.testing.assert_allclose(flow_m, flow_s, atol=1e-6)


def test_clip_sharded_requires_divisible_batch():
    from pwstablenet_tpu.config import PipelineConfig
    from pwstablenet_tpu.pipeline import Stabilizer
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisible"):
        Stabilizer(
            ModelConfig(num_levels=3, model_resolution=(16, 16)),
            PipelineConfig(batch_windows=3),
            mesh=make_mesh(),
        )


class TestSpatialShardedWarp:
    """Row-sharded warp with ICI halo exchange (parallel/spatial.py):
    sharded output must equal the unsharded oracle."""

    def _case(self, h=64, w=128, mag=0.25, seed=0):
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        img = jnp.asarray(rng.random((2, h, w, 3), np.float32))
        lf = (rng.random((2, 4, 4, 2), np.float32) - 0.5) * mag
        flow = jax.image.resize(jnp.asarray(lf), (2, h, w, 2), "bilinear")
        return img, flow

    def test_matches_unsharded_border(self):
        from pwstablenet_tpu.ops.grid_sample import grid_sample
        from pwstablenet_tpu.ops.warp import flow_to_grid
        from pwstablenet_tpu.parallel import make_mesh, spatial_sharded_warp

        mesh = make_mesh()
        img, flow = self._case()
        ref = grid_sample(img, flow_to_grid(flow), padding_mode="border")
        out = spatial_sharded_warp(
            img, flow, mesh, halo=8, padding_mode="border"
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5
        )

    def test_matches_unsharded_reflection(self):
        from pwstablenet_tpu.ops.grid_sample import grid_sample
        from pwstablenet_tpu.ops.warp import flow_to_grid
        from pwstablenet_tpu.parallel import make_mesh, spatial_sharded_warp

        mesh = make_mesh()
        img, flow = self._case(mag=0.2, seed=3)
        ref = grid_sample(
            img, flow_to_grid(flow), padding_mode="reflection"
        )
        out = spatial_sharded_warp(
            img, flow, mesh, halo=8, padding_mode="reflection"
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5
        )

    def test_output_stays_sharded(self):
        from pwstablenet_tpu.parallel import make_mesh, spatial_sharded_warp

        mesh = make_mesh()
        img, flow = self._case()
        out = spatial_sharded_warp(img, flow, mesh, halo=8)
        # the result must remain row-sharded (no implicit gather)
        assert len(out.sharding.device_set) == mesh.devices.size

    def test_rejects_zeros_and_bad_halo(self):
        import pytest as _pytest

        from pwstablenet_tpu.parallel import make_mesh, spatial_sharded_warp

        mesh = make_mesh()
        img, flow = self._case()
        with _pytest.raises(ValueError, match="zeros"):
            spatial_sharded_warp(img, flow, mesh, padding_mode="zeros")
        with _pytest.raises(ValueError, match="halo"):
            spatial_sharded_warp(img, flow, mesh, halo=9)


def test_multihost_noop_and_info():
    """Single-process: initialization is a no-op; topology info sane."""
    from pwstablenet_tpu.parallel import (
        maybe_initialize_distributed,
        process_info,
    )

    assert maybe_initialize_distributed() is False
    info = process_info()
    assert info["process_count"] == 1
    assert info["global_devices"] == 8  # the virtual CPU mesh


def test_spatial_sharded_warp_uint8():
    """uint8 shards: rounded (not truncated) outputs, matching the
    normalize->warp->requantize reference within 1 code."""
    import jax.numpy as jnp

    from pwstablenet_tpu.ops.grid_sample import grid_sample
    from pwstablenet_tpu.ops.warp import flow_to_grid
    from pwstablenet_tpu.parallel import make_mesh, spatial_sharded_warp

    mesh = make_mesh()
    rng = np.random.default_rng(9)
    img_u8 = rng.integers(0, 256, (1, 64, 128, 3), np.uint8)
    lf = (rng.random((1, 4, 4, 2), np.float32) - 0.5) * 0.2
    flow = jax.image.resize(jnp.asarray(lf), (1, 64, 128, 2), "bilinear")

    out = spatial_sharded_warp(jnp.asarray(img_u8), flow, mesh, halo=8)
    assert np.asarray(out).dtype == np.uint8

    imgf = jnp.asarray(img_u8).astype(jnp.float32) / 127.5 - 1.0
    ref = grid_sample(imgf, flow_to_grid(flow), padding_mode="border")
    ref_u8 = np.clip(
        (np.asarray(ref) + 1.0) * 127.5, 0, 255
    ).round().astype(np.int16)
    diff = np.abs(np.asarray(out).astype(np.int16) - ref_u8)
    assert diff.max() <= 1, diff.max()


@pytest.mark.skipif(
    os.environ.get("PWSTABLE_RUN_SLOW") != "1",
    reason="DEFAULT-config sharded step: 2h51m cold XLA-CPU compile on "
           "this host (measured; the same step compiles in ~31s on TPU). "
           "Set PWSTABLE_RUN_SLOW=1 to run; run green in round 3 — see "
           "STATUS.md / scratch/r5_default_sharded_probe.py",
)
def test_default_config_sharded_one_step():
    """ONE DP train step of the FULL default config — 8 levels, bf16
    compute, instance norm, dropout rngs, EMA — on the 8-device mesh,
    plus a full-config clip-sharded inference chunk (VERDICT r2 item 4:
    SPMD interactions of the real config, not the 16x16 toy)."""
    from pwstablenet_tpu.config import PipelineConfig
    from pwstablenet_tpu.pipeline import Stabilizer
    from pwstablenet_tpu.train.state import generator_params

    cfg = ModelConfig(use_dropout=True)
    tcfg = TrainConfig(batch_size=8, ema_decay=0.995)
    state, (gen, disc, feat) = create_train_state(
        cfg, tcfg, jax.random.PRNGKey(0)
    )
    mesh = make_mesh(MeshConfig())
    assert mesh.devices.size == 8
    step = data_parallel_step(make_train_step(cfg, tcfg, gen, disc, feat),
                              mesh)
    state = replicate_tree(state, mesh)
    batch = shard_batch(
        make_train_batch(8, 256, 256, cfg.temporal_window, seed=0), mesh
    )
    state, metrics = step(state, batch)
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert state.g_ema is not None

    stab = Stabilizer(cfg, PipelineConfig(batch_windows=8),
                      params=generator_params(state), mesh=mesh)
    clip = (np.random.default_rng(0).integers(
        0, 256, (24, 144, 256, 3))).astype(np.uint8)
    out, flows = stab.stabilize_frames(clip)
    assert out.shape == clip.shape
    assert np.isfinite(flows).all()
