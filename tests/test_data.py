"""DeepStab loader + synthetic data + eval metric tests
(SURVEY.md C2-C4, C21)."""

import numpy as np
import pytest

from pwstablenet_tpu.config import DataConfig
from pwstablenet_tpu.data.deepstab import (
    DeepStabDataset,
    batch_iterator,
    write_synthetic_deepstab,
)
from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
from pwstablenet_tpu.eval import stability_report, stability_score


@pytest.fixture(scope="module")
def deepstab_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("deepstab"))
    write_synthetic_deepstab(root, num_pairs=2, frames=24,
                             height=96, width=128)
    return root


def test_dataset_sample_shapes(deepstab_root):
    cfg = DataConfig(data_root=deepstab_root, crop_size=(64, 64))
    ds = DeepStabDataset(cfg, temporal_window=3)
    s = ds.sample(np.random.default_rng(0))
    assert s["stacks"].shape == (2, 64, 64, 9)
    assert s["stable"].shape == (2, 64, 64, 3)
    # uint8 device-transport format (normalized on device; ops/pixels.py)
    assert s["stacks"].dtype == np.uint8
    assert s["stable"].dtype == np.uint8


def test_dataset_temporal_consistency(deepstab_root):
    """The two time steps share video and crop: the second stack's
    center frame equals the first stack's next-neighbor frame."""
    cfg = DataConfig(data_root=deepstab_root, crop_size=(64, 64),
                     random_flip=False)
    ds = DeepStabDataset(cfg, temporal_window=3)
    s = ds.sample(np.random.default_rng(1))
    # stack layout: [f(t-1), f(t), f(t+1)] on channels
    center_of_second = s["stacks"][1][..., 3:6]
    next_of_first = s["stacks"][0][..., 6:9]
    np.testing.assert_allclose(center_of_second, next_of_first, atol=1e-6)


def test_batch_iterator(deepstab_root):
    cfg = DataConfig(data_root=deepstab_root, crop_size=(64, 64))
    ds = DeepStabDataset(cfg, temporal_window=3)
    it = batch_iterator(ds, batch_size=3, seed=0)
    b = next(it)
    assert b["stacks"].shape == (3, 2, 64, 64, 9)
    assert b["stable"].shape == (3, 2, 64, 64, 3)


def test_too_short_video_clear_error(tmp_path):
    """All pairs shorter than the temporal window raise a clear
    ValueError at CONSTRUCTION (not at a random step mid-training —
    advisor finding, round 2)."""
    root = str(tmp_path / "short")
    write_synthetic_deepstab(root, num_pairs=1, frames=4,
                             height=96, width=128)
    cfg = DataConfig(data_root=root, crop_size=(64, 64))
    with pytest.raises(ValueError, match="temporal_window"):
        DeepStabDataset(cfg, temporal_window=7)


def test_too_short_pair_skipped_with_warning(tmp_path, capsys):
    """A too-short pair among good ones is skipped at construction with
    a stderr warning; sampling then never draws it."""
    root = str(tmp_path / "mixed")
    write_synthetic_deepstab(root, num_pairs=2, frames=20,
                             height=96, width=128)
    # truncate pair 01 to 4 frames by rewriting it
    from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
    from pwstablenet_tpu.data.video_io import write_video

    s, u = synthetic_pair_clip(4, 96, 128, seed=9)
    write_video(str(tmp_path / "mixed/stable/01.avi"), s, 30.0, "MJPG")
    write_video(str(tmp_path / "mixed/unstable/01.avi"), u, 30.0, "MJPG")
    cfg = DataConfig(data_root=root, crop_size=(64, 64))
    ds = DeepStabDataset(cfg, temporal_window=7)
    assert len(ds.pairs) == 1
    assert "skipping video pair" in capsys.readouterr().err
    for _ in range(4):  # only the long pair is ever drawn
        sample = ds.sample(np.random.default_rng(0))
        assert sample["stacks"].shape == (2, 64, 64, 21)


def test_missing_dataset_raises():
    with pytest.raises(FileNotFoundError):
        DeepStabDataset(DataConfig(data_root="/nonexistent"), 3)


def test_stability_metrics_order():
    """A stable clip must score higher than its shaky counterpart."""
    stable, unstable = synthetic_pair_clip(24, 96, 128, seed=2,
                                           shake_px=8.0)
    s_stable = stability_score(stable)
    s_unstable = stability_score(unstable)
    assert s_stable > s_unstable, (s_stable, s_unstable)


def test_stability_report_keys():
    stable, unstable = synthetic_pair_clip(12, 96, 128, seed=3)
    rep = stability_report(stable, unstable)
    assert set(rep) == {
        "stability_score",
        "jitter_rms_px",
        "tracked_pair_fraction",
        "original_stability_score",
        "original_jitter_rms_px",
        "cropping_ratio",
        "distortion_value",
    }
    assert 0 < rep["cropping_ratio"] < 2
    assert 0 < rep["distortion_value"] <= 1.001
    # GT-stable clip jitters less than the shaky one
    assert rep["jitter_rms_px"] < rep["original_jitter_rms_px"]
    # a textured synthetic clip tracks every pair
    assert rep["tracked_pair_fraction"] == 1.0


def test_untrackable_clip_reports_zero_tracked_fraction():
    """A degenerate (featureless) output scores 'perfectly stable' under
    the constant-velocity hold; tracked_pair_fraction is the signal that
    the measurement failed rather than the video being stable (advisor
    finding, round 3)."""
    blank = np.zeros((6, 96, 128, 3), dtype=np.float32)
    rep = stability_report(blank)
    assert rep["tracked_pair_fraction"] == 0.0


def test_jitter_rms_px_short_clip_ignores_pan_trend():
    """On clips shorter than the smoothing window the window shrinks
    instead of falling back to raw variance — a pure pan ramp on a
    6-frame clip must not be charged as jitter (advisor finding,
    round 3: np.var(path) counted the whole ramp)."""
    from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
    from pwstablenet_tpu.eval.metrics import jitter_rms_px

    stable, _ = synthetic_pair_clip(2, 96, 128, seed=8, pan_px=0.0)
    base = stable[0]
    ramp = np.stack(
        [np.roll(base, shift=(0, 4 * i), axis=(0, 1)) for i in range(6)]
    )
    assert jitter_rms_px(ramp) < 1.0


def test_interframe_transform_recovers_known_shift():
    """C21 metric internals: KLT + affine estimation recovers a known
    integer translation between frames of a textured clip."""
    from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
    from pwstablenet_tpu.eval.metrics import interframe_transforms

    stable, _ = synthetic_pair_clip(2, 96, 128, seed=5, pan_px=0.0)
    a = stable[0]
    b = np.roll(a, shift=(3, 5), axis=(0, 1))  # +3 rows, +5 cols
    ms = interframe_transforms(np.stack([a, b]))
    assert len(ms) == 1
    # feature at (x, y) in a appears at (x+5, y+3) in b
    np.testing.assert_allclose(ms[0][0, 2], 5.0, atol=0.5)
    np.testing.assert_allclose(ms[0][1, 2], 3.0, atol=0.5)
    # pure translation: rotation part ~ identity
    np.testing.assert_allclose(ms[0][:2, :2], np.eye(2), atol=0.02)


def test_tracking_failure_holds_velocity_not_identity():
    """Untrackable frames reuse the previous transform (constant-velocity
    hold): an identity substitution would inject a fake full-stop — a
    high-frequency step — into the trajectory and penalize the stability
    score for a metrology failure (round-5 finding: this is exactly what
    happened on blurred high-resolution frames)."""
    from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
    from pwstablenet_tpu.eval.metrics import interframe_transforms

    stable, _ = synthetic_pair_clip(2, 96, 128, seed=5, pan_px=0.0)
    a = stable[0]
    b = np.roll(a, shift=(0, 4), axis=(0, 1))
    blank = np.zeros_like(a)  # zero corners: tracking must fail
    ms = interframe_transforms(np.stack([a, b, blank, blank]))
    assert len(ms) == 3
    np.testing.assert_allclose(ms[0][0, 2], 4.0, atol=0.5)
    # both untrackable steps hold the last measured motion
    np.testing.assert_array_equal(ms[1], ms[0])
    np.testing.assert_array_equal(ms[2], ms[0])


def test_jitter_rms_px_measures_shake_amplitude():
    """jitter_rms_px ~ 0 on a smooth pan ramp; ~ the shake amplitude on
    an alternating shake — independent of the pan (the property the
    spectral stability score loses on long panning clips)."""
    from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
    from pwstablenet_tpu.eval.metrics import jitter_rms_px

    stable, _ = synthetic_pair_clip(2, 96, 128, seed=8, pan_px=0.0)
    base = stable[0]

    def clip_from_offsets(offsets):
        return np.stack(
            [np.roll(base, shift=(0, int(o)), axis=(0, 1)) for o in offsets]
        )

    t = np.arange(24)
    smooth = clip_from_offsets(2 * t)  # pure 2 px/frame pan
    shaky = clip_from_offsets(2 * t + 4 * (-1) ** t)  # +-4 px shake
    j_smooth = jitter_rms_px(smooth)
    j_shaky = jitter_rms_px(shaky)
    assert j_smooth < 1.0, j_smooth
    assert 2.0 < j_shaky < 8.0, j_shaky


def test_high_resolution_tracking_with_texture_detail():
    """At 720p the base texture octaves alone are featureless (~60 px
    blobs) and the tracker used to lock onto moving occluders/noise;
    with texture_detail_px the metric recovers a known pan at native
    resolution (round-5 fix for the at-resolution scoring)."""
    from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
    from pwstablenet_tpu.eval.metrics import interframe_transforms

    stable, _ = synthetic_pair_clip(
        4, 720, 1280, seed=9, pan_px=2.25, shake_px=0.0,
        texture_detail_px=8.0,
    )
    ms = interframe_transforms(stable)
    # camera pans (+x, +0.3x in y) => content moves by (-pan_x, -pan_y)
    for m in ms:
        np.testing.assert_allclose(m[0, 2], -2.25, atol=0.5)
        np.testing.assert_allclose(m[1, 2], -0.675, atol=0.5)


def test_cropping_and_distortion_detect_known_warps():
    """cropping_ratio drops under a known zoom-in; distortion_value
    drops under a known anisotropic stretch."""
    import cv2

    from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
    from pwstablenet_tpu.eval.metrics import cropping_ratio_and_distortion

    stable, _ = synthetic_pair_clip(3, 96, 128, seed=6, pan_px=0.0)
    h, w = stable.shape[1:3]

    def apply(mat):
        return np.stack([
            cv2.warpAffine(f, mat, (w, h), flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_REFLECT)
            for f in stable
        ])

    # identity
    rep0 = cropping_ratio_and_distortion(stable, stable)
    assert abs(rep0["cropping_ratio"] - 1.0) < 0.02
    assert rep0["distortion_value"] > 0.98

    # zoom-in by 1.2x (content cropped): original->stabilized scale 1.2,
    # so cropping_ratio rises above 1/that... the metric reports the
    # mean homography scale original->stabilized
    zoom = cv2.getRotationMatrix2D((w / 2, h / 2), 0.0, 1.2)
    rep_z = cropping_ratio_and_distortion(stable, apply(zoom))
    np.testing.assert_allclose(rep_z["cropping_ratio"], 1.2, atol=0.05)
    assert rep_z["distortion_value"] > 0.95  # isotropic

    # anisotropic stretch: x scaled 1.3, y unchanged
    stretch = np.array([[1.3, 0.0, -0.15 * w], [0.0, 1.0, 0.0]],
                       np.float32)
    rep_s = cropping_ratio_and_distortion(stable, apply(stretch))
    np.testing.assert_allclose(
        rep_s["distortion_value"], 1 / 1.3, atol=0.05
    )


def test_warp_field_writer_roundtrip(tmp_path):
    """Streaming warp-field archive: chunked writes, one concatenated
    load; legacy single-key archives still load."""
    from pwstablenet_tpu.data.warp_fields import (
        WarpFieldWriter,
        load_warp_fields,
    )

    rng = np.random.default_rng(0)
    chunks = [rng.standard_normal((n, 8, 8, 2)).astype(np.float32)
              for n in (4, 4, 2)]
    path = str(tmp_path / "wf.npz")
    with WarpFieldWriter(path) as w:
        for c in chunks:
            w.write(c)
    assert w.frames == 10
    got = load_warp_fields(path)
    np.testing.assert_array_equal(got, np.concatenate(chunks))

    legacy = str(tmp_path / "legacy.npz")
    np.savez_compressed(legacy, warp_fields=np.concatenate(chunks))
    np.testing.assert_array_equal(
        load_warp_fields(legacy), np.concatenate(chunks)
    )


def test_fidelity_metrics():
    """PSNR/SSIM: identical clips score perfectly; noise degrades both
    monotonically."""
    from pwstablenet_tpu.eval import fidelity_report, psnr, ssim

    rng = np.random.default_rng(4)
    clip = rng.random((4, 32, 32, 3)).astype(np.float32) * 2 - 1
    assert psnr(clip, clip) == float("inf")
    assert ssim(clip, clip) > 0.999

    light = np.clip(clip + rng.normal(0, 0.02, clip.shape), -1, 1)
    heavy = np.clip(clip + rng.normal(0, 0.2, clip.shape), -1, 1)
    rep_l = fidelity_report(light.astype(np.float32), clip)
    rep_h = fidelity_report(heavy.astype(np.float32), clip)
    assert rep_l["psnr_db"] > rep_h["psnr_db"] > 10.0
    assert rep_l["ssim"] > rep_h["ssim"] > 0.0
