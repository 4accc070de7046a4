"""Periodic held-out evaluation during training (eval/hooks.py +
TrainConfig.eval_every)."""

from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
from pwstablenet_tpu.eval.hooks import make_clip_eval_hook
from pwstablenet_tpu.train.loop import synthetic_batch_iterator, train

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


def test_eval_hook_logs_metrics(tmp_path):
    stable, unstable = synthetic_pair_clip(12, 48, 64, seed=7)
    hook = make_clip_eval_hook(
        TINY, unstable, stable_clip=stable, batch_windows=4
    )
    train_cfg = TrainConfig(
        batch_size=2,
        log_every=10,
        eval_every=2,
        checkpoint_every=1000,
        checkpoint_dir=str(tmp_path / "ckpt"),
        stage_weights=(1.0,),
        ema_decay=0.5,   # hook must pick the EMA weights
    )
    logged = []
    train(
        TINY,
        train_cfg,
        synthetic_batch_iterator(TINY, train_cfg),
        max_steps=2,
        log_fn=logged.append,
        eval_fn=hook,
    )
    evals = [m for m in logged if "eval_stability" in m]
    assert len(evals) == 1 and evals[0]["step"] == 2
    m = evals[0]
    assert 0.0 <= m["eval_stability"] <= 1.0
    assert "eval_psnr_vs_stable" in m
    assert "eval_stability_unstable" in m
