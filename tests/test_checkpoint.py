"""Checkpoint / resume / fault-injection tests (SURVEY.md section 5.3-4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.data import make_train_batch
from pwstablenet_tpu.train import checkpoint as ckpt
from pwstablenet_tpu.train import create_train_state, make_train_step
from pwstablenet_tpu.train.loop import (
    FaultInjected,
    synthetic_batch_iterator,
    train,
)

TINY = ModelConfig(
    temporal_window=3,
    num_levels=3,
    base_features=8,
    max_features=16,
    model_resolution=(16, 16),
    num_stages=1,
    disc_num_layers=1,
    feat_channels=(8,),
    compute_dtype="float32",
)


def _tcfg(tmp_path, **kw):
    defaults = dict(
        batch_size=2,
        num_epochs=1,
        steps_per_epoch=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=2,
        log_every=100,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def test_save_restore_roundtrip(tmp_path):
    tcfg = _tcfg(tmp_path)
    state, (gen, disc, feat) = create_train_state(
        TINY, tcfg, jax.random.PRNGKey(0)
    )
    step = jax.jit(make_train_step(TINY, tcfg, gen, disc, feat))
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_train_batch(2, 16, 16, 3, seed=0)
    )
    state, _ = step(state, batch)
    ckpt.save_state(tcfg.checkpoint_dir, state)

    template, _ = create_train_state(TINY, tcfg, jax.random.PRNGKey(9))
    restored = ckpt.restore_state(tcfg.checkpoint_dir, template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.g_params),
        jax.tree_util.tree_leaves(restored.g_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (resume-exactness)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.g_opt),
        jax.tree_util.tree_leaves(restored.g_opt),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fault_inject_then_resume(tmp_path):
    """Crash mid-training via the debug flag, resume from the last
    checkpoint, and finish — the SURVEY.md section 5.3 story."""
    tcfg = _tcfg(tmp_path, fault_inject_step=3)
    with pytest.raises(FaultInjected):
        train(TINY, tcfg, synthetic_batch_iterator(TINY, tcfg),
              max_steps=4, log_fn=lambda m: None)
    assert ckpt.latest_step(tcfg.checkpoint_dir) == 2

    tcfg2 = _tcfg(tmp_path)  # no fault
    final = train(TINY, tcfg2, synthetic_batch_iterator(TINY, tcfg2),
                  resume=True, max_steps=4, log_fn=lambda m: None)
    assert int(final.step) == 4
    assert ckpt.latest_step(tcfg2.checkpoint_dir) == 4


def test_params_export_import(tmp_path):
    state, _ = create_train_state(
        TINY, _tcfg(tmp_path), jax.random.PRNGKey(0)
    )
    path = str(tmp_path / "gparams")
    ckpt.save_params(path, state.g_params)
    loaded = ckpt.load_params(path)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.g_params),
        jax.tree_util.tree_leaves(loaded),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_step_tracking(tmp_path):
    """The loop records the best eval step (best_step.json + a params
    export that survives pruning) and load_generator_params(step='best')
    loads it (SURVEY 5.5; GAN quality is non-monotonic)."""
    scores = iter([0.5, 0.9, 0.7])  # best at the 2nd eval (step 2)

    def fake_eval(state):
        return {"eval_stability": next(scores)}

    cfg = _tcfg(tmp_path, steps_per_epoch=3, eval_every=1,
                checkpoint_every=10)
    train(TINY, cfg, synthetic_batch_iterator(TINY, cfg),
          max_steps=3, log_fn=lambda m: None, eval_fn=fake_eval)

    info = ckpt.best_step(cfg.checkpoint_dir)
    assert info is not None
    assert info["step"] == 2
    assert info["metric"] == "eval_stability"
    assert abs(info["value"] - 0.9) < 1e-9

    params = ckpt.load_generator_params(cfg.checkpoint_dir, step="best")
    assert jax.tree_util.tree_leaves(params)


def test_missing_step_reports_available(tmp_path):
    """Requesting a pruned/nonexistent step fails with the available
    steps listed, not an opaque orbax error (advisor finding)."""
    cfg = _tcfg(tmp_path)
    state, _ = create_train_state(TINY, cfg, jax.random.PRNGKey(0))
    ckpt.save_state(cfg.checkpoint_dir, state)
    with pytest.raises(FileNotFoundError, match="available"):
        ckpt.load_generator_params(cfg.checkpoint_dir, step=123456)


def test_latest_step_is_read_only(tmp_path):
    """latest_step on an arbitrary path must not create it or write
    manager metadata into it (advisor finding)."""
    target = tmp_path / "does_not_exist"
    assert ckpt.latest_step(str(target)) is None
    assert not target.exists()

    # an existing non-checkpoint dir stays untouched
    plain = tmp_path / "plain"
    plain.mkdir()
    (plain / "file.txt").write_text("x")
    assert ckpt.latest_step(str(plain)) is None
    assert sorted(p.name for p in plain.iterdir()) == ["file.txt"]


@pytest.mark.parametrize("direction", ["drop", "init"])
def test_resume_with_different_ema_setting(tmp_path, direction):
    """Resuming with --ema-decay flipped on/off reconciles the template
    with a clear notice instead of an opaque orbax structure error
    (advisor finding)."""
    ema_on = dict(ema_decay=0.99)
    save_cfg = _tcfg(tmp_path, **(ema_on if direction == "drop" else {}))
    state, (gen, disc, feat) = create_train_state(
        TINY, save_cfg, jax.random.PRNGKey(0)
    )
    ckpt.save_state(save_cfg.checkpoint_dir, state)

    load_cfg = _tcfg(tmp_path, **({} if direction == "drop" else ema_on))
    template, _ = create_train_state(TINY, load_cfg, jax.random.PRNGKey(1))
    restored = ckpt.restore_state(save_cfg.checkpoint_dir, template)
    if direction == "drop":
        assert restored.g_ema is None
    else:
        assert restored.g_ema is not None
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.g_ema),
            jax.tree_util.tree_leaves(restored.g_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # generator params restored exactly either way
    for a, b in zip(
        jax.tree_util.tree_leaves(state.g_params),
        jax.tree_util.tree_leaves(restored.g_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scalar_log_file(tmp_path):
    """TrainConfig.scalar_log_path (SURVEY 5.5): the same JSONL scalars
    land in the file."""
    import json

    from pwstablenet_tpu.train.loop import synthetic_batch_iterator

    log_path = str(tmp_path / "scalars.jsonl")
    cfg = _tcfg(
        tmp_path, steps_per_epoch=2, log_every=1, scalar_log_path=log_path
    )
    it = synthetic_batch_iterator(TINY, cfg)
    train(TINY, cfg, it, max_steps=2)
    lines = [json.loads(l) for l in open(log_path)]
    assert len(lines) == 2
    assert {"loss_g", "loss_d", "step"} <= set(lines[0])


def test_best_tracking_resets_on_eval_config_change(tmp_path):
    """A recorded best from a DIFFERENT eval configuration must not
    suppress new best exports on resume (advisor finding, round 2):
    a fingerprint mismatch resets the tracked best."""
    def eval_a(state):
        return {"eval_stability": 0.95}

    eval_a.fingerprint = "cfg-A"

    cfg = _tcfg(tmp_path, steps_per_epoch=1, eval_every=1,
                checkpoint_every=10)
    train(TINY, cfg, synthetic_batch_iterator(TINY, cfg),
          max_steps=1, log_fn=lambda m: None, eval_fn=eval_a)
    info = ckpt.best_step(cfg.checkpoint_dir)
    assert info["value"] == pytest.approx(0.95)
    assert info["eval_fingerprint"] == "cfg-A"

    # resume with a different eval config scoring LOWER — without the
    # reset, 0.6 < 0.95 would never export
    def eval_b(state):
        return {"eval_stability": 0.6}

    eval_b.fingerprint = "cfg-B"
    train(TINY, cfg, synthetic_batch_iterator(TINY, cfg),
          max_steps=2, resume=True, log_fn=lambda m: None, eval_fn=eval_b)
    info = ckpt.best_step(cfg.checkpoint_dir)
    assert info["value"] == pytest.approx(0.6)
    assert info["eval_fingerprint"] == "cfg-B"


def test_clip_eval_hook_has_fingerprint():
    from pwstablenet_tpu.eval.hooks import make_clip_eval_hook

    clip = np.zeros((4, 16, 16, 3), np.uint8)
    fn1 = make_clip_eval_hook(TINY, clip, batch_windows=2)
    fn2 = make_clip_eval_hook(TINY, clip + 1, batch_windows=2)
    assert isinstance(fn1.fingerprint, str) and fn1.fingerprint
    assert fn1.fingerprint != fn2.fingerprint  # clip content matters


def test_checkpoint_has_ema_probe_is_metadata_only(tmp_path, monkeypatch):
    """_checkpoint_has_ema answers from the saved tree metadata without
    restoring the full checkpoint (advisor finding, round 2)."""
    import orbax.checkpoint as ocp

    for track_ema, expect in ((True, True), (False, False)):
        d = tmp_path / ("ema" if track_ema else "noema")
        cfg = _tcfg(d, **(dict(ema_decay=0.99) if track_ema else {}))
        state, _ = create_train_state(TINY, cfg, jax.random.PRNGKey(0))
        ckpt.save_state(cfg.checkpoint_dir, state)
        with ckpt._manager(cfg.checkpoint_dir, keep=1, create=False) as mgr:
            # any full restore would go through mgr.restore — forbid it
            monkeypatch.setattr(
                mgr, "restore",
                lambda *a, **k: (_ for _ in ()).throw(
                    AssertionError("full restore used for EMA probe")
                ),
            )
            assert ckpt._checkpoint_has_ema(mgr, 0) is expect
