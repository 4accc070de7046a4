"""CLI surface tests (SURVEY.md C20).

The two heavy commands run in-process through ``cli.main`` (a
subprocess would re-import jax and recompile everything, ~5 min); the
argument-error path runs as a true subprocess.
"""

import json
import os
import subprocess
import sys

import numpy as np

from pwstablenet_tpu.cli import main


def test_stabilize_synthetic(tmp_path, capsys):
    out = str(tmp_path / "out.avi")
    wf = str(tmp_path / "wf.npz")
    rc = main([
        "stabilize", "--synthetic", "--frames", "10",
        "--height", "48", "--width", "64",
        "--num-levels", "4", "--base-features", "8",
        "--temporal-window", "3", "--model-height", "32",
        "--model-width", "32",
        "--batch-windows", "4",
        "--output", out, "--warp-fields", wf,
    ])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["frames"] == 10
    assert os.path.exists(out)
    assert np.load(wf)["warp_fields"].shape[0] == 10


def test_train_synthetic_smoke(tmp_path, capsys):
    rc = main([
        "train", "--synthetic", "--steps", "2", "--batch-size", "2",
        "--num-levels", "3", "--base-features", "8",
        "--temporal-window", "3", "--model-height", "16",
        "--model-width", "16", "--log-every", "1",
        "--disc-layers", "1",
        "--checkpoint-every", "2",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    assert any("loss_g" in l for l in lines)
    assert os.path.isdir(tmp_path / "ckpt")


def test_train_use_dropout_flag(tmp_path, capsys):
    """--use-dropout reaches ModelConfig (the champion recipe's
    regularizer is CLI-reachable) and the tiny train still runs."""
    rc = main([
        "train", "--synthetic", "--steps", "1", "--batch-size", "2",
        "--num-levels", "3", "--base-features", "8",
        "--temporal-window", "3", "--model-height", "16",
        "--model-width", "16", "--log-every", "1", "--use-dropout",
        "--disc-layers", "1",
        "--checkpoint-every", "1",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    assert any("loss_g" in l for l in lines)


def test_train_ema_export_then_stabilize(tmp_path, capsys):
    """--ema-decay + --export-params produce inference weights that
    `stabilize --checkpoint` loads; --tb-log-dir writes event files."""
    tb = str(tmp_path / "tb")
    exported = str(tmp_path / "gen_params")
    rc = main([
        "train", "--synthetic", "--steps", "2", "--batch-size", "2",
        "--num-levels", "3", "--base-features", "8",
        "--temporal-window", "3", "--model-height", "16",
        "--model-width", "16", "--log-every", "1",
        "--disc-layers", "1",
        "--checkpoint-every", "2",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--ema-decay", "0.9", "--tb-log-dir", tb,
        "--export-params", exported,
    ])
    assert rc == 0
    capsys.readouterr()

    import glob

    from pwstablenet_tpu.utils.tb_writer import read_event_file

    events = read_event_file(glob.glob(tb + "/events.out.tfevents.*")[0])
    assert any("loss_g" in e.get("scalars", {}) for e in events)

    out = str(tmp_path / "out.avi")
    rc = main([
        "stabilize", "--synthetic", "--frames", "6",
        "--height", "48", "--width", "64",
        "--num-levels", "3", "--base-features", "8",
        "--temporal-window", "3", "--model-height", "16",
        "--model-width", "16",
        "--batch-windows", "3", "--checkpoint", exported,
        "--output", out,
    ])
    assert rc == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["frames"] == 6


def test_stabilize_with_torch_checkpoint(tmp_path, capsys):
    """A migrated reference .pth loads straight into the CLI (C18/C20)."""
    import pytest

    torch = pytest.importorskip("torch")
    from pwstablenet_tpu.config import ModelConfig
    from pwstablenet_tpu.interop.torch_ref import TorchCascadedGenerator

    cfg = ModelConfig(
        temporal_window=3, num_levels=4, base_features=8, max_features=16,
        model_resolution=(32, 32), num_stages=1, compute_dtype="float32",
    )
    pth = str(tmp_path / "ref.pth")
    torch.save(TorchCascadedGenerator(cfg).state_dict(), pth)
    out = str(tmp_path / "out.avi")
    rc = main([
        "stabilize", "--synthetic", "--frames", "8",
        "--height", "48", "--width", "64",
        "--num-levels", "4", "--base-features", "8",
        "--max-features", "16",
        "--temporal-window", "3", "--model-height", "32",
        "--model-width", "32", "--num-stages", "1",
        "--batch-windows", "4", "--checkpoint", pth,
        "--output", out,
    ])
    assert rc == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["frames"] == 8


def test_stabilize_data_parallel(tmp_path, capsys):
    """--data-parallel engages clip-sharded inference on the virtual
    8-device CPU mesh."""
    out = str(tmp_path / "out.avi")
    rc = main([
        "stabilize", "--synthetic", "--frames", "10",
        "--height", "48", "--width", "64",
        "--num-levels", "4", "--base-features", "8",
        "--temporal-window", "3", "--model-height", "32",
        "--model-width", "32",
        "--batch-windows", "8", "--data-parallel",
        "--output", out,
    ])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["frames"] == 10


def test_train_mesh_devices_cap(tmp_path, capsys):
    """--mesh-devices caps the data-parallel mesh size."""
    rc = main([
        "train", "--synthetic", "--steps", "1", "--batch-size", "4",
        "--num-levels", "3", "--base-features", "8",
        "--temporal-window", "3", "--model-height", "16",
        "--model-width", "16", "--log-every", "1",
        "--disc-layers", "1",
        "--checkpoint-every", "1",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--mesh-devices", "2",
    ])
    assert rc == 0


def test_make_data_then_eval(tmp_path, capsys):
    """make-data writes a loadable DeepStab-shaped dataset; eval with
    --ground-truth adds PSNR/SSIM."""
    root = str(tmp_path / "ds")
    rc = main([
        "make-data", "--out", root, "--pairs", "1", "--frames", "8",
        "--height", "48", "--width", "64",
    ])
    assert rc == 0
    capsys.readouterr()
    stable = os.path.join(root, "stable")
    unstable = os.path.join(root, "unstable")
    (name,) = os.listdir(stable)
    rc = main([
        "eval", "--input", os.path.join(unstable, name),
        "--original", os.path.join(unstable, name),
        "--ground-truth", os.path.join(stable, name),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "stability_score" in report
    assert "psnr_db" in report and "ssim" in report
    assert report["psnr_db"] > 5.0


def test_make_data_rich_and_train_rich_smoke(tmp_path, capsys):
    """--rich flows through make-data and synthetic training."""
    root = str(tmp_path / "rich_ds")
    rc = main([
        "make-data", "--out", root, "--rich", "--pairs", "1",
        "--frames", "8", "--height", "48", "--width", "64",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rich"] is True
    assert os.listdir(os.path.join(root, "unstable"))

    rc = main([
        "train", "--synthetic", "--rich", "--steps", "1",
        "--batch-size", "2", "--num-levels", "3", "--base-features", "8",
        "--temporal-window", "3", "--model-height", "16",
        "--model-width", "16", "--log-every", "1",
        "--disc-layers", "1",
        "--temporal-mode", "raw",
        "--checkpoint-every", "5",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    assert any("loss_g" in l for l in lines)


def test_train_eval_flags_must_pair(tmp_path):
    """DeepStab mode: --eval-every without --eval-clip (or vice versa)
    errors out instead of silently skipping eval (advisor finding)."""
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main([
            "train", "--data-root", str(tmp_path / "nope"),
            "--steps", "1", "--eval-every", "5",
        ])


def test_missing_args_error():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    r = subprocess.run(
        [sys.executable, "-m", "pwstablenet_tpu.cli", "stabilize"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 2
    assert "--input/--output required" in r.stderr
