"""Native C++ video runtime tests (SURVEY.md N-4)."""

import numpy as np
import pytest

from pwstablenet_tpu.data import native_io, video_io
from pwstablenet_tpu.data.synthetic import synthetic_pair_clip

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native runtime not built"
)


@pytest.fixture(scope="module")
def clip_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nio") / "clip.avi")
    _, unstable = synthetic_pair_clip(25, 96, 128, seed=5)
    video_io.write_video(path, unstable, 30.0, "MJPG")
    return path, unstable


def test_decode_matches_python_path(clip_file):
    path, _ = clip_file
    ref, fps = video_io.read_video(path, dtype=np.uint8)
    dec = native_io.NativeDecoder(path, chunk_frames=7)
    assert (dec.height, dec.width) == ref.shape[1:3]
    got = np.concatenate(list(dec))
    assert got.shape == ref.shape and got.dtype == np.uint8
    np.testing.assert_array_equal(got, ref)


def test_encode_decode_roundtrip(clip_file, tmp_path):
    path, clip = clip_file
    out = str(tmp_path / "out.avi")
    enc = native_io.NativeEncoder(out, 30.0, clip.shape[1:3], "MJPG")
    enc.write(clip)
    enc.close()
    back, _ = video_io.read_video(out)
    assert back.shape == clip.shape
    # MJPG is lossy; values must be close
    assert np.abs(back - clip).mean() < 0.05


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        native_io.NativeDecoder("/nonexistent/file.avi")


def test_pipeline_uses_native_path(clip_file, tmp_path):
    from pwstablenet_tpu.config import ModelConfig, PipelineConfig
    from pwstablenet_tpu.pipeline import Stabilizer

    path, clip = clip_file
    cfg = ModelConfig(
        temporal_window=3, num_levels=4, base_features=8, max_features=16,
        model_resolution=(32, 32), num_stages=1, compute_dtype="float32",
    )
    stab = Stabilizer(cfg, PipelineConfig(batch_windows=4))
    dst = str(tmp_path / "stab.avi")
    result = stab.stabilize_video(path, dst)
    assert result["frames"] == clip.shape[0]
    decoded, _ = video_io.read_video(dst)
    assert decoded.shape[0] == clip.shape[0]
