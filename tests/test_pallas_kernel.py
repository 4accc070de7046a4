"""Pallas fused grid-sample kernel vs the XLA oracle (SURVEY.md
section 4.2 "unit (TPU)" tier).

These run the kernel in interpret mode on CPU — same semantics as the
Mosaic-compiled kernel minus hardware lowering quirks; the compiled
kernel is additionally validated on real TPU by ``bench.py`` (where
both padding modes measured max err 0.0 vs the oracle at 64x256x3).

Shapes are kept small: interpret mode executes the kernel's unrolled
vector ops one by one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwstablenet_tpu.ops import grid_sample
from pwstablenet_tpu.ops.warp import flow_to_grid
from pwstablenet_tpu.kernels.grid_sample_pallas import (
    grid_sample_pallas,
    pallas_supported,
)


def _smooth_case(b=1, h=16, w=128, c=1, cells=4, mag=0.1, seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random((b, h, w, c), np.float32))
    lf = (rng.random((b, cells, cells, 2), np.float32) - 0.5) * mag
    flow = jax.image.resize(jnp.asarray(lf), (b, h, w, 2), "bilinear")
    return img, flow_to_grid(flow)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_kernel_matches_oracle(padding_mode):
    img, grid = _smooth_case()
    ref = grid_sample(img, grid, padding_mode=padding_mode)
    out = grid_sample_pallas(
        img, grid, padding_mode=padding_mode, row_window=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_kernel_zeros_mode_out_of_bounds_rows():
    """Flows pushing taps across the frame edge (the y0==-1 / y1==0
    corner case) must match the oracle exactly."""
    img, _ = _smooth_case(h=16, w=128)
    # constant upward shift of 1.5 px: top rows sample above the frame
    flow = jnp.zeros((1, 16, 128, 2), jnp.float32)
    flow = flow.at[..., 1].set(-2.0 / 15 * 1.5)
    grid = flow_to_grid(flow)
    ref = grid_sample(img, grid, padding_mode="zeros")
    out = grid_sample_pallas(
        img, grid, padding_mode="zeros", row_window=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_kernel_multichannel():
    img, grid = _smooth_case(c=3, h=8, w=128, seed=1)
    ref = grid_sample(img, grid)
    out = grid_sample_pallas(img, grid, row_window=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pallas_supported_dispatch():
    assert pallas_supported((8, 256, 256, 3), jnp.float32)
    assert pallas_supported((8, 720, 1280, 3), jnp.bfloat16)
    assert not pallas_supported((1, 250, 256, 3), jnp.float32)  # H % 8
    assert not pallas_supported((1, 256, 250, 3), jnp.float32)  # W % 128
    assert not pallas_supported((1, 2160, 3840, 3), jnp.float32)  # VMEM


def test_kernel_rejects_bad_shapes():
    img = jnp.zeros((1, 250, 128, 1))
    grid = jnp.zeros((1, 250, 128, 2))
    with pytest.raises(ValueError, match="requires H"):
        grid_sample_pallas(img, grid)
