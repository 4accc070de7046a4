"""Rich synthetic scene model tests (SURVEY.md C2/C4 — the data
frontier: perspective shake, parallax layers, moving occluders,
photometric jitter, textureless regions)."""

import numpy as np
import pytest

from pwstablenet_tpu.data.synthetic import (
    RICH,
    make_train_batch,
    synthetic_pair_clip,
)


def test_rich_clip_shapes_range_determinism():
    s1, u1 = synthetic_pair_clip(8, 64, 96, seed=5, **RICH)
    s2, u2 = synthetic_pair_clip(8, 64, 96, seed=5, **RICH)
    for c in (s1, u1):
        assert c.shape == (8, 64, 96, 3)
        assert c.dtype == np.float32
        assert np.isfinite(c).all()
        assert c.min() >= -1.0 and c.max() <= 1.0
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(u1, u2)
    # the unstable view actually differs from the stable one
    assert np.abs(s1 - u1).mean() > 0.01


def test_default_knobs_reproduce_flat_world():
    """All knobs default off => same generator as before (flat world)."""
    s_a, u_a = synthetic_pair_clip(6, 48, 64, seed=3)
    s_b, u_b = synthetic_pair_clip(
        6, 48, 64, seed=3,
        perspective=0.0, parallax_layers=0, num_occluders=0,
        photometric=0.0, textureless_frac=0.0,
    )
    np.testing.assert_array_equal(s_a, s_b)
    np.testing.assert_array_equal(u_a, u_b)


def test_texture_detail_adds_fine_structure_only_when_on():
    """texture_detail_px=0 leaves the rng stream (and output)
    bit-identical; >0 adds fine octaves, raising gradient energy."""
    s_off, u_off = synthetic_pair_clip(2, 256, 256, seed=13, **RICH)
    s_off2, _ = synthetic_pair_clip(
        2, 256, 256, seed=13, texture_detail_px=0.0, **RICH
    )
    np.testing.assert_array_equal(s_off, s_off2)
    # the knob targets HIGH resolutions (at 720p the base octaves leave
    # ~60 px featureless blobs); compare gradient energy there
    s_hi_off, _ = synthetic_pair_clip(2, 720, 960, seed=13, shake_px=0.0)
    s_hi_on, _ = synthetic_pair_clip(
        2, 720, 960, seed=13, shake_px=0.0, texture_detail_px=8.0
    )
    grad = lambda c: float(  # noqa: E731 — mean gradient magnitude
        np.abs(np.diff(c, axis=1)).mean() + np.abs(np.diff(c, axis=2)).mean()
    )
    assert grad(s_hi_on) > 1.5 * grad(s_hi_off), (
        grad(s_hi_on), grad(s_hi_off)
    )


def test_textureless_regions_flatten_texture():
    """Flattening most of the base plane lowers spatial variance of the
    stable view (same seed => same base texture before flattening)."""
    s_flat, _ = synthetic_pair_clip(2, 64, 64, seed=7, textureless_frac=0.9)
    s_full, _ = synthetic_pair_clip(2, 64, 64, seed=7, textureless_frac=0.0)
    gvar = lambda c: float(  # noqa: E731 — mean gradient magnitude
        np.abs(np.diff(c, axis=1)).mean() + np.abs(np.diff(c, axis=2)).mean()
    )
    assert gvar(s_flat) < 0.5 * gvar(s_full), (gvar(s_flat), gvar(s_full))


def test_photometric_jitter_changes_channel_gains():
    """With photometric=1 the unstable camera has a static per-channel
    gain mismatch + flicker: channel means drift off the stable view's
    well beyond what the tiny default rotation could cause."""
    s, u = synthetic_pair_clip(
        6, 64, 64, seed=11, shake_px=0.0, photometric=1.0
    )
    s0, u0 = synthetic_pair_clip(
        6, 64, 64, seed=11, shake_px=0.0, photometric=0.0
    )
    drift = np.abs(u.mean(axis=(0, 1, 2)) - s.mean(axis=(0, 1, 2)))
    drift0 = np.abs(u0.mean(axis=(0, 1, 2)) - s0.mean(axis=(0, 1, 2)))
    assert drift.max() > drift0.max()
    # noise floor: unstable view carries sensor noise
    hf = np.abs(np.diff(u, axis=2)).mean()
    hf0 = np.abs(np.diff(u0, axis=2)).mean()
    assert hf > hf0


def test_parallax_breaks_global_translation_model():
    """With parallax layers, no single global shift aligns consecutive
    STABLE frames (pure pan otherwise matches exactly up to resampling):
    the best-shift residual grows vs the flat world."""

    def best_shift_residual(clip):
        a, b = clip[0], clip[-1]
        best = np.inf
        for dy in range(-6, 7):
            for dx in range(-6, 7):
                ay0, ay1 = max(0, dy), min(64, 64 + dy)
                ax0, ax1 = max(0, dx), min(64, 64 + dx)
                ra = a[ay0:ay1, ax0:ax1]
                rb = b[ay0 - dy : ay1 - dy, ax0 - dx : ax1 - dx]
                best = min(best, float(np.abs(ra - rb).mean()))
        return best

    s_flat, _ = synthetic_pair_clip(5, 64, 64, seed=13, pan_px=1.0)
    s_par, _ = synthetic_pair_clip(
        5, 64, 64, seed=13, pan_px=1.0, parallax_layers=3
    )
    assert best_shift_residual(s_par) > best_shift_residual(s_flat)


def test_occluder_moves_independently():
    """An occluder changes the scene where it passes; frames differ from
    the occluder-free render far beyond resampling noise, and the
    difference region moves over time."""
    s_occ, _ = synthetic_pair_clip(10, 64, 64, seed=17, num_occluders=1)
    assert np.isfinite(s_occ).all()
    # occluder-covered pixels change frame to frame even for a slow pan:
    # per-frame diffs must show a localized high-change blob (the moving
    # object) — max pixel change well above the pan-induced median
    d = np.abs(s_occ[1:] - s_occ[:-1]).mean(axis=-1)  # (T-1, H, W)
    assert float(d.max()) > 5 * float(np.median(d) + 1e-6)


def test_perspective_shake_nonuniform_displacement():
    """Pure perspective shake displaces frame edges more than the
    center (a global translation cannot explain it)."""
    s, u = synthetic_pair_clip(
        12, 64, 64, seed=19, shake_px=0.0, perspective=4.0,
    )
    # compare center crop vs edge strip motion energy across frames
    du = np.abs(u[1:] - u[:-1])
    center = du[:, 24:40, 24:40].mean()
    edge = np.concatenate(
        [du[:, :8].reshape(11, -1), du[:, -8:].reshape(11, -1)], axis=1
    ).mean()
    assert edge > center, (edge, center)


def test_make_train_batch_rich():
    b = make_train_batch(2, 32, 32, 3, seed=1, rich=True)
    assert b["stacks"].shape == (2, 2, 32, 32, 9)
    assert b["stable"].shape == (2, 2, 32, 32, 3)
    assert b["stacks"].dtype == np.uint8


def test_write_synthetic_deepstab_rich(tmp_path):
    from pwstablenet_tpu.config import DataConfig
    from pwstablenet_tpu.data.deepstab import (
        DeepStabDataset,
        write_synthetic_deepstab,
    )

    root = str(tmp_path / "rich")
    write_synthetic_deepstab(root, num_pairs=2, frames=12,
                             height=96, width=128, rich=True)
    ds = DeepStabDataset(DataConfig(data_root=root, crop_size=(64, 64)), 3)
    s = ds.sample(np.random.default_rng(0))
    assert s["stacks"].shape == (2, 64, 64, 9)
    assert s["stable"].dtype == np.uint8


def test_write_synthetic_deepstab_curriculum(tmp_path):
    """--curriculum widens the stressor draws (round-5 measured recipe):
    loadable dataset, draws actually differ from the rich preset's."""
    from pwstablenet_tpu.config import DataConfig
    from pwstablenet_tpu.data.deepstab import (
        DeepStabDataset,
        write_synthetic_deepstab,
    )
    import cv2

    rich_root = str(tmp_path / "rich")
    cur_root = str(tmp_path / "cur")
    kw = dict(num_pairs=2, frames=8, height=64, width=80, seed=3)
    write_synthetic_deepstab(rich_root, rich=True, **kw)
    write_synthetic_deepstab(cur_root, curriculum=True, **kw)

    ds = DeepStabDataset(
        DataConfig(data_root=cur_root, crop_size=(48, 48)), 3)
    s = ds.sample(np.random.default_rng(0))
    assert s["stacks"].shape == (2, 48, 48, 9)

    # the widened draws must actually change the rendered clips
    def frames_of(root):
        cap = cv2.VideoCapture(f"{root}/unstable/00.avi")
        ok, img = cap.read()
        cap.release()
        assert ok
        return img

    assert np.abs(frames_of(cur_root).astype(np.int16)
                  - frames_of(rich_root).astype(np.int16)).max() > 0


def test_motion_blur_smears_unstable_view():
    """Shutter streaking lowers the unstable view's high-frequency
    energy; the stable view (no blur applied) is untouched."""
    s0, u0 = synthetic_pair_clip(8, 64, 64, seed=23, shake_px=10.0,
                                 motion_blur=0.0)
    s1, u1 = synthetic_pair_clip(8, 64, 64, seed=23, shake_px=10.0,
                                 motion_blur=1.0)
    np.testing.assert_array_equal(s0, s1)
    hf = lambda c: float(np.abs(np.diff(c[1:], axis=2)).mean())  # noqa: E731
    assert hf(u1) < 0.9 * hf(u0), (hf(u1), hf(u0))


def test_exposure_steps_jump_and_persist():
    """Exposure-step events produce abrupt persistent jumps in the
    unstable view's mean brightness (beyond the smooth flicker)."""
    _, u0 = synthetic_pair_clip(40, 48, 48, seed=31, shake_px=0.0,
                                exposure_steps=0.0)
    _, u1 = synthetic_pair_clip(40, 48, 48, seed=31, shake_px=0.0,
                                exposure_steps=1.0)
    m0 = u0.mean(axis=(1, 2, 3))
    m1 = u1.mean(axis=(1, 2, 3))
    jumps0 = float(np.abs(np.diff(m0)).max())
    jumps1 = float(np.abs(np.diff(m1)).max())
    assert jumps1 > 5 * (jumps0 + 1e-6), (jumps1, jumps0)


def test_occluder_anchored_under_long_pan():
    """With a strong cumulative pan, the occluder must still occlude
    LATE frames (pre-fix it drifted off-frame — advisor finding): the
    last frame differs from its occluder-free render by a localized
    blob."""
    kw = dict(shake_px=2.0, pan_px=3.0)
    s_occ, _ = synthetic_pair_clip(60, 64, 64, seed=37, num_occluders=1,
                                   **kw)
    s_no, _ = synthetic_pair_clip(60, 64, 64, seed=37, num_occluders=0,
                                  **kw)
    # NOTE: with num_occluders=0 the rng stream shifts (occluder init
    # draws are skipped), so the worlds differ; instead check the
    # occluder's footprint directly: late-frame inter-frame change must
    # still contain a high-change moving blob, as the early frames do.
    d = np.abs(s_occ[1:] - s_occ[:-1]).mean(axis=-1)
    early = float(d[:10].max())
    late = float(d[-10:].max())
    assert late > 0.3 * early, (late, early)
