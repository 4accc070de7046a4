"""Causal (low-latency) temporal mode: ModelConfig.temporal_center
puts the current frame LAST in the stack so streaming inference needs
zero future lookahead.  The causality property is enforced here, not
just documented."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwstablenet_tpu.config import DataConfig, ModelConfig, TrainConfig
from pwstablenet_tpu.data import make_train_batch
from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
from pwstablenet_tpu.pipeline import PipelineConfig, Stabilizer

SMALL = ModelConfig(
    temporal_window=5,
    num_levels=4,
    base_features=8,
    max_features=16,
    model_resolution=(32, 32),
    num_stages=2,
    compute_dtype="float32",
)
CAUSAL = dataclasses.replace(SMALL, temporal_center=4)  # current frame last


def test_config_validation():
    assert SMALL.center_index == 2 and SMALL.future_frames == 2
    assert CAUSAL.center_index == 4 and CAUSAL.future_frames == 0
    with pytest.raises(ValueError, match="temporal_center"):
        ModelConfig(temporal_window=5, temporal_center=5)
    with pytest.raises(ValueError, match="temporal_center"):
        ModelConfig(temporal_window=5, temporal_center=-1)


def _nontrivial_stabilizer(cfg, seed=0):
    """Stabilizer whose warp heads are randomized (nonzero flows)."""
    import flax

    stab = Stabilizer(cfg, PipelineConfig(batch_windows=4), seed=seed)
    params = flax.core.unfreeze(stab.params)
    rng = np.random.default_rng(seed)
    for s in range(cfg.num_stages):
        head = params["params"][f"stage{s}"]["head"]
        head["kernel"] = jnp.asarray(
            rng.standard_normal(head["kernel"].shape).astype(np.float32)
            * 0.02
        )
    stab.params = params
    return stab


def test_causal_output_ignores_future_frames():
    """THE causality property: changing frames after t leaves the
    stabilized frames up to t bit-identical.  The symmetric model (the
    negative control) does react to the same change."""
    _, clip = synthetic_pair_clip(12, 48, 64, seed=1)
    altered = clip.copy()
    altered[8:] = clip[8:][:, ::-1]  # clobber frames 8..11

    causal = _nontrivial_stabilizer(CAUSAL, seed=2)
    out_a, flows_a = causal.stabilize_frames(clip)
    out_b, flows_b = causal.stabilize_frames(altered)
    np.testing.assert_array_equal(out_a[:8], out_b[:8])
    np.testing.assert_array_equal(flows_a[:8], flows_b[:8])

    sym = _nontrivial_stabilizer(SMALL, seed=2)
    s_a, _ = sym.stabilize_frames(clip)
    s_b, _ = sym.stabilize_frames(altered)
    # frames 6/7 see future context 8/9 through the symmetric window
    assert np.abs(s_a[6:8] - s_b[6:8]).max() > 0


def test_causal_identity_at_init_and_shapes():
    _, clip = synthetic_pair_clip(9, 48, 64, seed=3)
    stab = Stabilizer(CAUSAL, PipelineConfig(batch_windows=4))
    out, flows = stab.stabilize_frames(clip)
    assert out.shape == clip.shape
    assert flows.shape[0] == clip.shape[0]
    np.testing.assert_allclose(out, clip, atol=1e-4)  # zero-init head


def test_causal_matches_symmetric_frame_count_short_clip():
    _, short = synthetic_pair_clip(2, 48, 64, seed=4)
    out, flows = Stabilizer(
        CAUSAL, PipelineConfig(batch_windows=4)
    ).stabilize_frames(short)
    assert out.shape[0] == 2 and flows.shape[0] == 2


def test_make_train_batch_causal_layout():
    """Two consecutive timesteps overlap by T-1 frames, shifted by one:
    stack[k=1]'s leading channels equal stack[k=0]'s trailing ones."""
    b = make_train_batch(2, 32, 32, 5, seed=5, temporal_center=4,
                         dtype=np.float32)
    s0, s1 = b["stacks"][:, 0], b["stacks"][:, 1]
    np.testing.assert_allclose(s1[..., :12], s0[..., 3:15], atol=1e-6)
    assert b["stable"].shape == (2, 2, 32, 32, 3)


def test_deepstab_causal_sample(tmp_path):
    from pwstablenet_tpu.data.deepstab import (
        DeepStabDataset,
        write_synthetic_deepstab,
    )

    root = str(tmp_path / "ds")
    write_synthetic_deepstab(root, num_pairs=1, frames=24,
                             height=96, width=128)
    ds = DeepStabDataset(
        DataConfig(data_root=root, crop_size=(64, 64), random_flip=False),
        temporal_window=3, temporal_center=2,
    )
    s = ds.sample(np.random.default_rng(0))
    assert s["stacks"].shape == (2, 64, 64, 9)
    # one-frame shift between the two timesteps' windows
    np.testing.assert_allclose(
        s["stacks"][1][..., :6], s["stacks"][0][..., 3:9], atol=1e-6
    )
    with pytest.raises(ValueError, match="temporal_center"):
        DeepStabDataset(DataConfig(data_root=root), 3, temporal_center=3)


def test_causal_train_step_smoke():
    from pwstablenet_tpu.train import create_train_state, make_train_step

    tcfg = TrainConfig(batch_size=2)
    state, (gen, disc, feat) = create_train_state(
        CAUSAL, tcfg, jax.random.PRNGKey(0)
    )
    step = jax.jit(make_train_step(CAUSAL, tcfg, gen, disc, feat))
    batch = jax.tree_util.tree_map(
        jnp.asarray,
        make_train_batch(2, 32, 32, 5, seed=6, temporal_center=4),
    )
    _, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_causal_torch_parity():
    """Golden parity holds for the causal wiring too (the interstage
    'warped' path extracts the LAST frame as the current one)."""
    torch = pytest.importorskip("torch")

    from pwstablenet_tpu.interop import torch_state_dict_to_flax
    from pwstablenet_tpu.interop.torch_ref import TorchCascadedGenerator
    from pwstablenet_tpu.models import CascadedGenerator

    cfg = dataclasses.replace(
        SMALL, temporal_center=4, num_levels=5,
        model_resolution=(64, 64), max_features=32,
    )
    tmodel = TorchCascadedGenerator(cfg)
    torch.manual_seed(3)
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d)):
            torch.nn.init.normal_(m.weight, std=0.05)
            torch.nn.init.normal_(m.bias, std=0.02)
    params = torch_state_dict_to_flax(tmodel.state_dict(), cfg)
    x = np.random.default_rng(3).standard_normal(
        (1, 64, 64, cfg.stack_channels)
    ).astype(np.float32)
    with torch.no_grad():
        tflows = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    fflows = CascadedGenerator(cfg).apply(params, jnp.asarray(x))
    for ff, tf in zip(fflows, tflows):
        np.testing.assert_allclose(
            np.asarray(ff), tf.permute(0, 2, 3, 1).numpy(), atol=5e-4
        )
