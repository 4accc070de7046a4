"""AOT export round-trip (serving artifact; pwstablenet_tpu/export.py)."""

import numpy as np

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.export import ExportedStabilizerStep, save_chunk_step
from pwstablenet_tpu.pipeline import Stabilizer

SMALL = ModelConfig(
    temporal_window=3,
    num_levels=4,
    base_features=8,
    max_features=16,
    model_resolution=(32, 32),
    num_stages=1,
    compute_dtype="float32",
)


def test_export_roundtrip(tmp_path):
    stab = Stabilizer(SMALL, PipelineConfig(batch_windows=4))
    path = str(tmp_path / "step.stablehlo")
    save_chunk_step(path, stab, frame_hw=(48, 64))

    step = ExportedStabilizerStep.load(path)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (4 + 2, 48, 64, 3), np.uint8)

    got_s, got_f = step(stab.params, frames)
    want_s, want_f = stab._chunk_step(
        stab.params, frames, stab._pallas_ok(frames.shape)
    )
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))
    np.testing.assert_allclose(
        np.asarray(got_f), np.asarray(want_f), atol=1e-6
    )
    assert np.asarray(got_s).dtype == np.uint8


def test_export_cli(tmp_path):
    """`export` subcommand writes a loadable artifact."""
    import json as _json

    from pwstablenet_tpu.cli import main

    out = str(tmp_path / "step.stablehlo")
    rc = main([
        "export", "--output", out,
        "--num-levels", "4", "--base-features", "8",
        "--max-features", "16", "--temporal-window", "3",
        "--num-stages", "1", "--model-height", "32",
        "--model-width", "32",
        "--height", "48", "--width", "64", "--batch-windows", "4",
    ])
    assert rc == 0
    step = ExportedStabilizerStep.load(out)
    # the exported signature matches the requested geometry
    frames_aval = step.in_avals[-1]
    assert frames_aval.shape == (4 + 2, 48, 64, 3)
