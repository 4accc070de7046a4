"""Warp-field round-trip tests (BASELINE.json:5 "stabilized clip +
warp fields out"): the exported fields must BE the transformation —
re-applying them to the original clip reproduces the stabilized output.
"""

import json
import os

import numpy as np
import pytest

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
from pwstablenet_tpu.data.video_io import read_video, write_video
from pwstablenet_tpu.data.warp_fields import load_warp_fields
from pwstablenet_tpu.pipeline import Stabilizer, apply_warp_fields

TINY = ModelConfig(
    temporal_window=3,
    num_levels=3,
    base_features=8,
    max_features=16,
    model_resolution=(32, 32),
    num_stages=2,
    disc_num_layers=1,
    feat_channels=(8,),
    compute_dtype="float32",
)


def _clip(frames=12, h=64, w=96):
    _, unstable = synthetic_pair_clip(frames, h, w, seed=3, shake_px=5.0)
    return np.clip((unstable + 1) * 127.5, 0, 255).round().astype(np.uint8)


def test_apply_warp_fields_reproduces_stabilize_frames():
    """apply_warp_fields(original, flows) == stabilize_frames' output
    exactly (same code path; uneven last chunk exercises padding)."""
    clip = _clip(frames=11)
    stab = Stabilizer(TINY, PipelineConfig(batch_windows=4), seed=7)
    out, flows = stab.stabilize_frames(clip)
    redo = apply_warp_fields(clip, flows, TINY, batch_frames=4)
    assert redo.shape == out.shape and redo.dtype == out.dtype
    np.testing.assert_array_equal(redo, out)


def test_apply_warp_fields_float_input():
    clip = _clip(frames=6).astype(np.float32) / 127.5 - 1.0
    stab = Stabilizer(TINY, PipelineConfig(batch_windows=3), seed=7)
    out, flows = stab.stabilize_frames(clip)
    redo = apply_warp_fields(clip, flows, TINY, batch_frames=3)
    np.testing.assert_allclose(redo, out, atol=1e-6)


def test_apply_warp_fields_length_mismatch():
    clip = _clip(frames=6)
    with pytest.raises(ValueError, match="same time steps"):
        apply_warp_fields(clip, np.zeros((5, 32, 32, 2), np.float32), TINY)


def test_video_roundtrip_via_npz(tmp_path):
    """File surface: stabilize --warp-fields emits an .npz whose fields,
    re-applied to the ORIGINAL decoded frames, reproduce the stabilized
    frames within the uint8 quantum (the written video itself is codec-
    lossy, so the comparison is against the in-memory output)."""
    clip = _clip(frames=10)
    inp = str(tmp_path / "in.avi")
    outp = str(tmp_path / "out.avi")
    npz = str(tmp_path / "fields.npz")
    write_video(inp, clip, 30.0, "MJPG")

    stab = Stabilizer(TINY, PipelineConfig(batch_windows=4), seed=7)
    stab.stabilize_video(inp, outp, warp_field_path=npz)

    decoded, _ = read_video(inp, dtype=np.uint8)
    flows = load_warp_fields(npz)
    assert flows.shape[0] == decoded.shape[0]
    # the same decoded frames through the in-memory path give the
    # reference output; the npz fields must reproduce it exactly
    out_ref, flows_ref = stab.stabilize_frames(decoded)
    np.testing.assert_allclose(flows, flows_ref, atol=1e-6)
    redo = apply_warp_fields(decoded, flows, TINY, batch_frames=4)
    np.testing.assert_array_equal(redo, out_ref)


def test_cli_apply_warp(tmp_path, capsys):
    from pwstablenet_tpu.cli.main import main

    clip = _clip(frames=8)
    inp = str(tmp_path / "in.avi")
    outp = str(tmp_path / "out.avi")
    npz = str(tmp_path / "fields.npz")
    redo_p = str(tmp_path / "redo.avi")
    write_video(inp, clip, 30.0, "MJPG")

    margs = [
        "--temporal-window", "3", "--model-height", "32",
        "--model-width", "32", "--num-levels", "3",
    ]
    rc = main(["stabilize", "--input", inp, "--output", outp,
               "--warp-fields", npz, "--batch-windows", "4"] + margs)
    assert rc == 0
    capsys.readouterr()
    rc = main(["apply-warp", "--input", inp, "--warp-fields", npz,
               "--output", redo_p, "--batch-frames", "4"] + margs)
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(redo_p)
    assert info["frames"] == 8
    # both videos hold the same transformation of the same frames —
    # equal up to codec loss on each side
    a, _ = read_video(outp, dtype=np.float32)
    b, _ = read_video(redo_p, dtype=np.float32)
    assert a.shape == b.shape
    assert float(np.abs(a - b).mean()) < 0.03
