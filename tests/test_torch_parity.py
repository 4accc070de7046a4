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


@pytest.mark.parametrize("norm", ["batch", "group", "none"])
def test_norm_variant_parity(norm):
    """The torch mirror covers every norm kind the Flax model ships
    (batch = stats-free BatchNorm2d, group = GroupNorm(8), none), so
    the golden-parity tier extends beyond the instance default."""
    cfg = dataclasses.replace(SMALL, norm=norm)
    fflows, tflows = _run_pair(cfg, seed=2)
    mse = float(np.mean((fflows[0] - tflows[0]) ** 2))
    assert mse <= 1e-3, f"warp-map MSE {mse} exceeds baseline contract"
    np.testing.assert_allclose(fflows[0], tflows[0], atol=2e-4)


@pytest.mark.parametrize("norm", ["batch", "group"])
def test_norm_variant_cascade_roundtrip(norm):
    """Converter round-trip (torch -> flax -> torch) for the non-default
    norm kinds on the full 2-stage cascade."""
    from pwstablenet_tpu.interop import flax_to_torch_state_dict

    cfg = dataclasses.replace(
        SMALL, norm=norm, num_stages=2, interstage="both"
    )
    tmodel = TorchCascadedGenerator(cfg)
    torch.manual_seed(4)
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d)):
            torch.nn.init.normal_(m.weight, std=0.05)
            torch.nn.init.normal_(m.bias, std=0.02)
    params = torch_state_dict_to_flax(tmodel.state_dict(), cfg)
    exported = flax_to_torch_state_dict(params, cfg)
    orig = {k: np.asarray(v) for k, v in tmodel.state_dict().items()}
    assert set(exported) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(exported[k], orig[k], err_msg=k)


@pytest.mark.parametrize("interstage", ["features", "warped", "both"])
def test_cascade_parity(interstage):
    cfg = dataclasses.replace(SMALL, num_stages=2, interstage=interstage)
    fflows, tflows = _run_pair(cfg, seed=1)
    for ff, tf in zip(fflows, tflows):
        mse = float(np.mean((ff - tf) ** 2))
        assert mse <= 1e-3, f"stage MSE {mse}"
        np.testing.assert_allclose(ff, tf, atol=5e-4)


def test_feature_extractor_parity():
    """Feature-extractor import (SURVEY.md C12/N-3): torch mirror ->
    feat_state_dict_to_flax -> identical per-scale feature maps."""
    from pwstablenet_tpu.interop import feat_state_dict_to_flax
    from pwstablenet_tpu.interop.torch_ref import TorchFeatureExtractor
    from pwstablenet_tpu.models import FeatureExtractor

    cfg = SMALL
    tfeat = TorchFeatureExtractor(cfg)
    torch.manual_seed(7)
    for m in tfeat.modules():
        if isinstance(m, torch.nn.Conv2d):
            torch.nn.init.normal_(m.weight, std=0.05)
            torch.nn.init.normal_(m.bias, std=0.02)

    params = feat_state_dict_to_flax(tfeat.state_dict(), cfg)
    ffeat = FeatureExtractor(cfg)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 32, 32, cfg.in_channels)).astype(np.float32)
    with torch.no_grad():
        touts = tfeat(torch.from_numpy(x).permute(0, 3, 1, 2))
    fouts = ffeat.apply(params, jnp.asarray(x))
    assert len(fouts) == len(touts) == len(cfg.feat_channels)
    for fo, to in zip(fouts, touts):
        np.testing.assert_allclose(
            np.asarray(fo), to.permute(0, 2, 3, 1).numpy(), atol=1e-5
        )


def test_torchvision_vgg_import():
    """A VGG-features-shaped state_dict (torchvision key layout,
    block widths 64/128) imports losslessly; wrong widths raise."""
    from pwstablenet_tpu.interop import torchvision_vgg_to_flax
    from pwstablenet_tpu.models import FeatureExtractor

    cfg = dataclasses.replace(SMALL, feat_channels=(64, 128))
    # Build a synthetic state_dict with torchvision VGG16 'features.N'
    # indices and shapes (offline stand-in for the real checkpoint).
    gen = torch.Generator().manual_seed(3)
    shapes = {0: (64, 3), 2: (64, 64), 5: (128, 64), 7: (128, 128)}
    sd = {}
    for idx, (o, i) in shapes.items():
        sd[f"features.{idx}.weight"] = (
            torch.randn(o, i, 3, 3, generator=gen) * 0.05
        )
        sd[f"features.{idx}.bias"] = torch.randn(o, generator=gen) * 0.02

    params = torchvision_vgg_to_flax(sd, cfg)
    # parity against the torch mirror loaded with the same weights
    from pwstablenet_tpu.interop.torch_ref import TorchFeatureExtractor

    tfeat = TorchFeatureExtractor(cfg)
    with torch.no_grad():
        for j, idx in enumerate([0, 2, 5, 7]):
            tfeat.convs[j].weight.copy_(sd[f"features.{idx}.weight"])
            tfeat.convs[j].bias.copy_(sd[f"features.{idx}.bias"])
    x = np.random.default_rng(3).standard_normal((1, 32, 32, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        touts = tfeat(torch.from_numpy(x).permute(0, 3, 1, 2))
    fouts = FeatureExtractor(cfg).apply(params, jnp.asarray(x))
    for fo, to in zip(fouts, touts):
        np.testing.assert_allclose(
            np.asarray(fo), to.permute(0, 2, 3, 1).numpy(),
            rtol=1e-5, atol=1e-3,
        )

    with pytest.raises(ValueError, match="VGG conv"):
        torchvision_vgg_to_flax(
            sd, dataclasses.replace(SMALL, feat_channels=(32, 64))
        )


@pytest.mark.parametrize("interstage", ["both"])
def test_flax_to_torch_export_roundtrip(interstage):
    """Reverse converter (flax -> torch): exporting a Flax cascade and
    loading it into the torch mirror reproduces the same warp maps."""
    from pwstablenet_tpu.interop import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    cfg = dataclasses.replace(SMALL, num_stages=2, interstage=interstage)
    # start from torch weights (nontrivial), convert to flax, export
    # back, and check the state dicts agree exactly
    tmodel = TorchCascadedGenerator(cfg)
    torch.manual_seed(5)
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d)):
            torch.nn.init.normal_(m.weight, std=0.05)
            torch.nn.init.normal_(m.bias, std=0.02)
    params = torch_state_dict_to_flax(tmodel.state_dict(), cfg)
    exported = flax_to_torch_state_dict(params, cfg)
    orig = {k: np.asarray(v) for k, v in tmodel.state_dict().items()}
    assert set(exported) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(exported[k], orig[k], err_msg=k)

    # and a fresh torch model loaded from the export matches the flax
    # forward end to end
    tmodel2 = TorchCascadedGenerator(cfg)
    tmodel2.load_state_dict(
        {k: torch.as_tensor(np.ascontiguousarray(v))
         for k, v in exported.items()}
    )
    rng = np.random.default_rng(6)
    h, w = cfg.model_resolution
    x = rng.standard_normal((1, h, w, cfg.stack_channels)).astype(np.float32)
    fflows = CascadedGenerator(cfg).apply(params, jnp.asarray(x))
    with torch.no_grad():
        tflows = tmodel2(torch.from_numpy(x).permute(0, 3, 1, 2))
    for ff, tf in zip(fflows, tflows):
        np.testing.assert_allclose(
            np.asarray(ff), tf.permute(0, 2, 3, 1).numpy(), atol=5e-4
        )


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
