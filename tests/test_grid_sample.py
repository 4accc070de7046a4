"""Parity tests: ops.grid_sample vs torch.nn.functional.grid_sample.

This is how the BASELINE.json "warp-map MSE <= 1e-3 vs PyTorch
reference" contract becomes a local, runnable test (SURVEY.md
section 4.2): torch 2.13.0+cpu is the oracle for the exact ATen
grid_sampler_2d semantics the reference relied on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import torch
import torch.nn.functional as F

from pwstablenet_tpu.ops import grid_sample, flow_to_grid, identity_grid, warp_image


def _rand_case(rng, b=2, h=13, w=17, c=3, ho=11, wo=9, grid_range=1.5):
    image = rng.standard_normal((b, h, w, c)).astype(np.float32)
    # grid beyond [-1, 1] to exercise padding behavior
    grid = (rng.random((b, ho, wo, 2)).astype(np.float32) * 2 - 1) * grid_range
    return image, grid


def _torch_grid_sample(image_nhwc, grid, mode, padding_mode, align_corners):
    t_img = torch.from_numpy(image_nhwc).permute(0, 3, 1, 2)  # NCHW
    t_grid = torch.from_numpy(grid)
    out = F.grid_sample(
        t_img,
        t_grid,
        mode=mode,
        padding_mode=padding_mode,
        align_corners=align_corners,
    )
    return out.permute(0, 2, 3, 1).numpy()  # back to NHWC


@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_matches_torch(mode, padding_mode, align_corners):
    rng = np.random.default_rng(0)
    image, grid = _rand_case(rng)
    expected = _torch_grid_sample(image, grid, mode, padding_mode, align_corners)
    got = np.asarray(
        grid_sample(
            jnp.asarray(image),
            jnp.asarray(grid),
            mode=mode,
            padding_mode=padding_mode,
            align_corners=align_corners,
        )
    )
    if mode == "nearest":
        # Rounding ties may fall either way in float; compare via value
        # closeness on the overwhelming majority and exact shape.
        mismatch = np.mean(~np.isclose(got, expected, atol=1e-5))
        assert mismatch < 0.02, f"nearest mismatch fraction {mismatch}"
    else:
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
def test_extreme_coordinates(padding_mode):
    """Coordinates far outside the frame must not index OOB or produce NaN."""
    rng = np.random.default_rng(1)
    image, _ = _rand_case(rng)
    grid = np.stack(
        np.meshgrid(
            np.linspace(-9.0, 9.0, 7, dtype=np.float32),
            np.linspace(-9.0, 9.0, 5, dtype=np.float32),
            indexing="xy",
        ),
        axis=-1,
    )[None].repeat(image.shape[0], axis=0)
    expected = _torch_grid_sample(image, grid, "bilinear", padding_mode, True)
    got = np.asarray(
        grid_sample(jnp.asarray(image), jnp.asarray(grid), padding_mode=padding_mode)
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_identity_grid_is_identity_warp():
    rng = np.random.default_rng(2)
    image = rng.standard_normal((2, 16, 24, 3)).astype(np.float32)
    grid = np.broadcast_to(
        np.asarray(identity_grid(16, 24)), (2, 16, 24, 2)
    ).copy()
    out = np.asarray(grid_sample(jnp.asarray(image), jnp.asarray(grid)))
    np.testing.assert_allclose(out, image, rtol=1e-5, atol=1e-5)


def test_zero_flow_warp_is_identity():
    rng = np.random.default_rng(3)
    image = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    flow = np.zeros((1, 32, 32, 2), np.float32)
    out = np.asarray(warp_image(jnp.asarray(image), jnp.asarray(flow)))
    np.testing.assert_allclose(out, image, rtol=1e-5, atol=1e-5)


def test_warp_with_low_res_flow_upsamples():
    """Model-resolution flow applied to a full-resolution frame."""
    rng = np.random.default_rng(4)
    image = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    # constant shift of +0.25 normalized units in x at quarter resolution
    flow = np.zeros((1, 16, 24, 2), np.float32)
    flow[..., 0] = 0.25
    out = np.asarray(warp_image(jnp.asarray(image), jnp.asarray(flow)))
    assert out.shape == image.shape
    # A constant normalized shift upsampled is still the same constant
    # shift; check against direct full-res application.
    full_flow = np.zeros((1, 64, 96, 2), np.float32)
    full_flow[..., 0] = 0.25
    expected = np.asarray(warp_image(jnp.asarray(image), jnp.asarray(full_flow)))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_grid_sample_differentiable():
    """Autodiff flows through both image and grid (needed by the train step)."""
    import jax

    rng = np.random.default_rng(5)
    image = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    grid = jnp.asarray(
        (rng.random((1, 8, 8, 2)).astype(np.float32) * 2 - 1) * 0.9
    )

    def loss(img, g):
        return jnp.sum(grid_sample(img, g) ** 2)

    gi, gg = jax.grad(loss, argnums=(0, 1))(image, grid)
    assert np.isfinite(np.asarray(gi)).all()
    assert np.isfinite(np.asarray(gg)).all()
    assert np.abs(np.asarray(gg)).max() > 0  # grid gradient is nonzero


def test_flow_to_grid_shapes():
    flow = jnp.zeros((2, 10, 12, 2))
    grid = flow_to_grid(flow)
    assert grid.shape == (2, 10, 12, 2)
    np.testing.assert_allclose(
        np.asarray(grid[0]), np.asarray(identity_grid(10, 12)), atol=1e-6
    )
