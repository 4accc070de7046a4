"""Pipeline end-to-end tests (SURVEY.md section 4.2 "pipeline e2e"):
synthetic clip -> stabilize() -> output shapes/finiteness/warp fields,
plus the video-file CLI surface via OpenCV round-trip.
"""

import os

import numpy as np
import pytest

from pwstablenet_tpu.config import ModelConfig, PipelineConfig
from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
from pwstablenet_tpu.data import video_io
from pwstablenet_tpu.pipeline import Stabilizer, stabilize

SMALL = ModelConfig(
    temporal_window=5,
    num_levels=4,
    base_features=8,
    max_features=16,
    model_resolution=(32, 32),
    num_stages=2,
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def clip():
    stable, unstable = synthetic_pair_clip(20, 48, 64, seed=1)
    return unstable


def test_stabilize_frames_shapes(clip):
    stab = Stabilizer(SMALL, PipelineConfig(batch_windows=4))
    out, flows = stab.stabilize_frames(clip)
    assert out.shape == clip.shape
    assert flows.shape == (clip.shape[0], 32, 32, 2)
    assert np.isfinite(out).all() and np.isfinite(flows).all()


def test_untrained_model_is_identity_warp(clip):
    """Zero-init warp heads: an untrained stabilizer returns the input."""
    stab = Stabilizer(SMALL, PipelineConfig(batch_windows=4))
    out, flows = stab.stabilize_frames(clip)
    np.testing.assert_allclose(out, clip, atol=1e-4)
    np.testing.assert_allclose(flows, 0.0, atol=1e-6)


@pytest.mark.parametrize("batch_windows", [3, 32])
def test_frame_count_preserved_across_chunkings(clip, batch_windows):
    stab = Stabilizer(SMALL, PipelineConfig(batch_windows=batch_windows))
    out, flows = stab.stabilize_frames(clip)
    assert out.shape[0] == clip.shape[0]
    assert flows.shape[0] == clip.shape[0]


def test_clip_shorter_than_temporal_window():
    """A 3-frame clip under T=5 still stabilizes (replicate-padded
    context at both clip edges)."""
    _, short = synthetic_pair_clip(3, 48, 64, seed=2)
    stab = Stabilizer(SMALL, PipelineConfig(batch_windows=4))
    out, flows = stab.stabilize_frames(short)
    assert out.shape == short.shape
    assert flows.shape[0] == 3
    np.testing.assert_allclose(out, short, atol=1e-4)  # identity at init


def test_single_frame_clip():
    _, one = synthetic_pair_clip(1, 48, 64, seed=3)
    stab = Stabilizer(SMALL, PipelineConfig(batch_windows=4))
    out, flows = stab.stabilize_frames(one)
    assert out.shape == one.shape and flows.shape[0] == 1


def test_stabilize_video_missing_input(tmp_path):
    stab = Stabilizer(SMALL, PipelineConfig(batch_windows=4))
    with pytest.raises(Exception):
        stab.stabilize_video(
            str(tmp_path / "does_not_exist.avi"),
            str(tmp_path / "out.avi"),
        )


def test_native_decoder_failure_falls_back_loudly(tmp_path, clip,
                                                  monkeypatch, capsys):
    """A broken native decoder (ABI mismatch / partial build) degrades
    to the Python path with a stderr notice, not silently (advisor
    finding, round 1); a missing input file still raises."""
    from pwstablenet_tpu.data import native_io

    monkeypatch.setattr(native_io, "available", lambda: True)

    class BrokenDecoder:
        def __init__(self, *a, **k):
            raise RuntimeError("simulated ABI mismatch")

    monkeypatch.setattr(native_io, "NativeDecoder", BrokenDecoder)

    src = str(tmp_path / "in.avi")
    dst = str(tmp_path / "out.avi")
    video_io.write_video(src, clip, fps=10.0, codec="MJPG")
    stab = Stabilizer(SMALL, PipelineConfig(batch_windows=4))
    result = stab.stabilize_video(src, dst)
    assert result["frames"] == clip.shape[0]
    assert os.path.exists(dst)
    err = capsys.readouterr().err
    assert "native video decoder failed" in err
    assert "simulated ABI mismatch" in err

    class MissingFileDecoder:
        def __init__(self, *a, **k):
            raise FileNotFoundError("no such video")

    monkeypatch.setattr(native_io, "NativeDecoder", MissingFileDecoder)
    with pytest.raises(FileNotFoundError):
        stab.stabilize_video(str(tmp_path / "nope.avi"), dst)


def test_chunked_equals_whole(clip):
    a = Stabilizer(SMALL, PipelineConfig(batch_windows=4)).stabilize_frames(clip)
    b = Stabilizer(SMALL, PipelineConfig(batch_windows=16)).stabilize_frames(clip)
    np.testing.assert_allclose(a[0], b[0], atol=1e-4)


def test_uint8_transport_matches_float_path(clip):
    """uint8 in -> uint8 out, equal (up to quantization) to the f32
    path — the device-transport contract (ops/pixels.py)."""
    clip_u8 = np.clip((clip + 1.0) * 127.5, 0, 255).round().astype(np.uint8)
    stab = Stabilizer(SMALL, PipelineConfig(batch_windows=4))
    out_u8, flows_u8 = stab.stabilize_frames(clip_u8)
    assert out_u8.dtype == np.uint8
    out_f, flows_f = stab.stabilize_frames(
        clip_u8.astype(np.float32) / 127.5 - 1.0
    )
    assert out_f.dtype == np.float32
    np.testing.assert_allclose(flows_u8, flows_f, atol=1e-6)
    out_f_q = np.clip((out_f + 1.0) * 127.5, 0, 255).round().astype(np.uint8)
    diff = np.abs(out_u8.astype(np.int16) - out_f_q.astype(np.int16))
    assert diff.max() <= 1  # rounding at the half-ULP boundary only


def test_functional_api(clip):
    out, flows = stabilize(clip[:8], SMALL)
    assert out.shape == clip[:8].shape


def test_video_file_roundtrip(tmp_path, clip):
    """Full video-in/video-out surface (C1 + C19)."""
    src = str(tmp_path / "in.avi")
    dst = str(tmp_path / "out.avi")
    wf = str(tmp_path / "wf.npz")
    video_io.write_video(src, clip, fps=10.0, codec="MJPG")

    stab = Stabilizer(SMALL, PipelineConfig(batch_windows=4))
    result = stab.stabilize_video(src, dst, warp_field_path=wf)
    assert os.path.exists(dst)
    assert result["frames"] == clip.shape[0]

    decoded, fps = video_io.read_video(dst)
    assert decoded.shape[0] == clip.shape[0]
    assert decoded.shape[1:] == clip.shape[1:]

    from pwstablenet_tpu.data.warp_fields import load_warp_fields

    flows = load_warp_fields(wf)
    assert flows.shape == (clip.shape[0], 32, 32, 2)


def test_border_crop(clip):
    stab = Stabilizer(
        SMALL, PipelineConfig(batch_windows=4, border_crop_frac=0.1)
    )
    cropped = stab._border_crop(clip)
    assert cropped.shape[1] == clip.shape[1] - 2 * int(clip.shape[1] * 0.1)


def test_prefetcher_order_and_errors():
    items = [np.full((2, 2), i) for i in range(7)]
    out = list(video_io.Prefetcher(iter(items), depth=2))
    assert len(out) == 7
    np.testing.assert_array_equal(out[3], items[3])

    def bad():
        yield items[0]
        raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(video_io.Prefetcher(bad(), depth=1))


def test_params_transfer_across_working_resolutions(clip):
    """The UNet is fully convolutional and its norms carry no spatial
    state, so params trained at one model_resolution apply unchanged at
    any other multiple of 2^num_levels (the round-5 zero-shot
    512-inference property; CLI --model-height/width).  Same params at
    2x the working resolution must produce finite flows at the new flow
    resolution and a full-size stabilized clip."""
    import dataclasses

    import jax

    base = Stabilizer(SMALL, PipelineConfig(batch_windows=4))
    params = base.params  # initialized at 32x32
    hi_cfg = dataclasses.replace(SMALL, model_resolution=(64, 64))
    hi = Stabilizer(hi_cfg, PipelineConfig(batch_windows=4), params=params)
    out, flows = hi.stabilize_frames(clip)
    assert out.shape == clip.shape
    assert flows.shape == (clip.shape[0], 64, 64, 2)
    assert np.isfinite(flows).all()
    # sanity: the transferred params produce the SAME flow field (up to
    # resampling) as at the native resolution — correlate the coarse
    # flow with the downsampled fine flow on one frame
    _, flows_lo = base.stabilize_frames(clip[:6])
    fine = jax.image.resize(flows[:6], flows_lo.shape, method="bilinear")
    a = np.asarray(fine[3]).ravel()
    b = np.asarray(flows_lo[3]).ravel()
    denom = float(np.linalg.norm(a) * np.linalg.norm(b))
    if denom > 1e-8:  # untrained zero-init head can make flows ~0
        corr = float(np.dot(a, b) / denom)
        assert corr > 0.5, corr


def test_warp_field_dtype_float16(clip):
    """PipelineConfig.warp_field_dtype: fp16 flow transport matches the
    f32 flows within fp16 precision."""
    stab32 = Stabilizer(SMALL, PipelineConfig(batch_windows=4))
    _, flows32 = stab32.stabilize_frames(clip)
    stab16 = Stabilizer(
        SMALL,
        PipelineConfig(batch_windows=4, warp_field_dtype="float16"),
        params=stab32.params,
    )
    _, flows16 = stab16.stabilize_frames(clip)
    assert flows16.dtype == np.float16
    np.testing.assert_allclose(
        flows16.astype(np.float32), flows32, atol=1e-3
    )
