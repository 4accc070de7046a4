"""Periodic in-training evaluation hooks (SURVEY.md §4.2 integration
tier, §5.5 observability).

The reference validated by eye after training finished; here a held-out
clip can be stabilized every ``TrainConfig.eval_every`` steps with the
CURRENT generator weights (EMA when tracked) and scored with the
offline metrics — the numbers ride the same JSONL/TensorBoard stream
as the training scalars.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

import jax

from pwstablenet_tpu.config import ModelConfig, PipelineConfig


def make_clip_eval_hook(
    model_cfg: ModelConfig,
    unstable_clip: np.ndarray,
    stable_clip: Optional[np.ndarray] = None,
    batch_windows: int = 8,
) -> Callable[[object], Dict[str, float]]:
    """Build an ``eval_fn`` for ``train.loop.train(eval_fn=...)``.

    Stabilizes ``unstable_clip`` ((T, H, W, 3), uint8 or [-1,1] f32)
    with the state's inference weights and reports the stability score
    (plus the improvement over the raw clip, and PSNR against
    ``stable_clip`` when ground truth is available).

    The underlying ``Stabilizer`` is created once — re-evaluations
    reuse its compiled chunk step (same shapes), so the cost per eval
    is one clip pass, not a recompile.
    """
    from pwstablenet_tpu.eval.metrics import psnr, stability_score
    from pwstablenet_tpu.pipeline import Stabilizer
    from pwstablenet_tpu.train.state import generator_params

    n = min(batch_windows, max(len(unstable_clip), 1))
    stab = Stabilizer(model_cfg, PipelineConfig(batch_windows=n))
    base_stability = stability_score(_to_unit(unstable_clip))

    def eval_fn(state) -> Dict[str, float]:
        stab.params = jax.device_get(generator_params(state))
        out, _ = stab.stabilize_frames(unstable_clip)
        outf = _to_unit(out)
        metrics = {
            "eval_stability": stability_score(outf),
            "eval_stability_unstable": base_stability,
        }
        if stable_clip is not None:
            metrics["eval_psnr_vs_stable"] = psnr(
                outf, _to_unit(stable_clip)
            )
        return metrics

    # identifies the eval configuration so best-step tracking doesn't
    # compare scores across incomparable setups on resume (the train
    # loop stores this in best_step.json — advisor finding, round 2)
    import hashlib

    h = hashlib.sha256()
    h.update(np.ascontiguousarray(unstable_clip).tobytes())
    h.update(repr(model_cfg).encode())
    h.update(b"gt" if stable_clip is not None else b"nogt")
    eval_fn.fingerprint = h.hexdigest()[:16]
    return eval_fn


def _to_unit(frames: np.ndarray) -> np.ndarray:
    if np.issubdtype(frames.dtype, np.integer):
        return frames.astype(np.float32) / 127.5 - 1.0
    return frames
