"""Golden parity: Flax generator vs the equivalent torch model with
identical (converted) weights — the local, runnable form of
BASELINE.json config 1's "pretrained checkpoint parity" clause
(SURVEY.md sections 0 and 4.2: the published .pth is unreachable
offline, so the documented torch expression of the architecture is the
oracle)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.interop import torch_state_dict_to_flax
from pwstablenet_tpu.interop.torch_ref import TorchCascadedGenerator
from pwstablenet_tpu.models import CascadedGenerator

SMALL = ModelConfig(
    temporal_window=3,
    num_levels=5,
    base_features=8,
    max_features=32,
    model_resolution=(64, 64),
    num_stages=1,
    compute_dtype="float32",
)


def _run_pair(cfg, seed=0):
    tmodel = TorchCascadedGenerator(cfg)
    torch.manual_seed(seed)
    # re-init with nonzero head so the comparison is nontrivial
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d)):
            torch.nn.init.normal_(m.weight, std=0.05)
            torch.nn.init.normal_(m.bias, std=0.02)

    params = torch_state_dict_to_flax(tmodel.state_dict(), cfg)
    fmodel = CascadedGenerator(cfg)

    rng = np.random.default_rng(seed)
    h, w = cfg.model_resolution
    x = rng.standard_normal((2, h, w, cfg.stack_channels)).astype(np.float32)

    with torch.no_grad():
        tflows = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    fflows = fmodel.apply(params, jnp.asarray(x))
    return (
        [np.asarray(f) for f in fflows],
        [t.permute(0, 2, 3, 1).numpy() for t in tflows],
    )


def test_single_stage_parity():
    fflows, tflows = _run_pair(SMALL)
    mse = float(np.mean((fflows[0] - tflows[0]) ** 2))
    assert mse <= 1e-3, f"warp-map MSE {mse} exceeds baseline contract"
    np.testing.assert_allclose(fflows[0], tflows[0], atol=1e-4)


@pytest.mark.parametrize("interstage", ["features", "warped", "both"])
def test_cascade_parity(interstage):
    cfg = dataclasses.replace(SMALL, num_stages=2, interstage=interstage)
    fflows, tflows = _run_pair(cfg, seed=1)
    for ff, tf in zip(fflows, tflows):
        mse = float(np.mean((ff - tf) ** 2))
        assert mse <= 1e-3, f"stage MSE {mse}"
        np.testing.assert_allclose(ff, tf, atol=5e-4)


def test_converted_checkpoint_roundtrip(tmp_path):
    """Full checkpoint flow: torch.save -> load_torch_checkpoint."""
    from pwstablenet_tpu.interop import load_torch_checkpoint

    cfg = SMALL
    tmodel = TorchCascadedGenerator(cfg)
    path = str(tmp_path / "ref.pth")
    torch.save({"state_dict": tmodel.state_dict()}, path)
    params = load_torch_checkpoint(path, cfg)
    fmodel = CascadedGenerator(cfg)
    h, w = cfg.model_resolution
    x = np.zeros((1, h, w, cfg.stack_channels), np.float32)
    flows = fmodel.apply(params, jnp.asarray(x))
    assert flows[0].shape == (1, h, w, 2)
