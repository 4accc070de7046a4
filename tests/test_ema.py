"""Generator-EMA tracking (TrainConfig.ema_decay): update math,
checkpoint roundtrip, and inference-weight selection."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.data import make_train_batch
from pwstablenet_tpu.train import (
    create_train_state,
    generator_params,
    make_train_step,
)

TINY = ModelConfig(
    temporal_window=3,
    num_levels=4,
    base_features=8,
    max_features=16,
    model_resolution=(32, 32),
    num_stages=1,
    disc_num_layers=2,
    feat_channels=(8, 16),
    compute_dtype="float32",
)


def _cfg(**kw):
    base = dict(
        batch_size=2, num_epochs=1, steps_per_epoch=10,
        stage_weights=(1.0,),
    )
    base.update(kw)
    return TrainConfig(**base)


def _run_steps(train_cfg, n=1, seed=0):
    state, (gen, disc, feat) = create_train_state(
        TINY, train_cfg, jax.random.PRNGKey(seed)
    )
    step = jax.jit(make_train_step(TINY, train_cfg, gen, disc, feat))
    init_g = state.g_params
    batch = make_train_batch(2, 32, 32, TINY.temporal_window, seed=1)
    for _ in range(n):
        state, _ = step(state, batch)
    return init_g, state


def _tree_allclose(a, b, atol=1e-6):
    ok = jax.tree_util.tree_map(
        lambda x, y: np.allclose(np.asarray(x), np.asarray(y), atol=atol),
        a, b,
    )
    return all(jax.tree_util.tree_leaves(ok))


def test_ema_disabled_by_default():
    _, state = _run_steps(_cfg(), n=1)
    assert state.g_ema is None
    # inference weights fall back to the raw params
    assert generator_params(state) is state.g_params


def test_ema_one_step_blend():
    """After one step: ema == d*init + (1-d)*g_params (exact blend)."""
    d = 0.5
    init_g, state = _run_steps(_cfg(ema_decay=d), n=1)
    expected = jax.tree_util.tree_map(
        lambda e, p: d * e + (1.0 - d) * p, init_g, state.g_params
    )
    assert _tree_allclose(state.g_ema, expected)
    # params actually moved, so ema != params
    assert not _tree_allclose(state.g_ema, state.g_params)
    assert generator_params(state) is state.g_ema
    assert generator_params(state, prefer_ema=False) is state.g_params


def test_ema_decay_one_freezes_init():
    init_g, state = _run_steps(_cfg(ema_decay=1.0), n=2)
    assert _tree_allclose(state.g_ema, init_g)


def test_ema_matches_raw_trajectory():
    """EMA tracking must not perturb the raw G/D trajectory."""
    _, s_off = _run_steps(_cfg(), n=2)
    _, s_on = _run_steps(_cfg(ema_decay=0.9), n=2)
    assert _tree_allclose(s_off.g_params, s_on.g_params)
    assert _tree_allclose(s_off.d_params, s_on.d_params)


def test_ema_with_grad_accum():
    d = 0.5
    init_g, state = _run_steps(_cfg(ema_decay=d, grad_accum_steps=2), n=1)
    expected = jax.tree_util.tree_map(
        lambda e, p: d * e + (1.0 - d) * p, init_g, state.g_params
    )
    assert _tree_allclose(state.g_ema, expected)


def test_load_generator_params_from_train_dir(tmp_path):
    """stabilize-style loading straight from a training checkpoint dir:
    EMA weights preferred when tracked, raw params otherwise; a
    save_params export still loads."""
    from pwstablenet_tpu.train import checkpoint as ckpt

    cfg = _cfg(ema_decay=0.5)
    _, state = _run_steps(cfg, n=1)
    ckpt.save_state(str(tmp_path / "ck"), state, keep=1)
    got = ckpt.load_generator_params(str(tmp_path / "ck"))
    assert _tree_allclose(got, state.g_ema)
    got_raw = ckpt.load_generator_params(
        str(tmp_path / "ck"), prefer_ema=False
    )
    assert _tree_allclose(got_raw, state.g_params)

    # explicit best-step selection: step 1 of a 2-step run
    _, s2 = _run_steps(cfg, n=2)
    ckpt.save_state(str(tmp_path / "ck_multi"), state, keep=5)
    ckpt.save_state(str(tmp_path / "ck_multi"), s2, keep=5)
    got_s1 = ckpt.load_generator_params(str(tmp_path / "ck_multi"), step=1)
    assert _tree_allclose(got_s1, state.g_ema)
    got_latest = ckpt.load_generator_params(str(tmp_path / "ck_multi"))
    assert _tree_allclose(got_latest, s2.g_ema)

    # without EMA tracking -> raw params
    _, state2 = _run_steps(_cfg(), n=1)
    ckpt.save_state(str(tmp_path / "ck2"), state2, keep=1)
    got2 = ckpt.load_generator_params(str(tmp_path / "ck2"))
    assert _tree_allclose(got2, state2.g_params)

    # params-only export path unchanged
    ckpt.save_params(str(tmp_path / "exported"), state.g_params)
    got3 = ckpt.load_generator_params(str(tmp_path / "exported"))
    assert _tree_allclose(got3, state.g_params)


def test_ema_checkpoint_roundtrip(tmp_path):
    from pwstablenet_tpu.train import checkpoint as ckpt

    cfg = _cfg(ema_decay=0.9)
    _, state = _run_steps(cfg, n=1)
    ckpt.save_state(str(tmp_path / "ck"), state, keep=1)
    template, _ = create_train_state(TINY, cfg, jax.random.PRNGKey(0))
    restored = ckpt.restore_state(str(tmp_path / "ck"), template)
    assert _tree_allclose(restored.g_ema, state.g_ema)
    assert int(restored.step) == 1
