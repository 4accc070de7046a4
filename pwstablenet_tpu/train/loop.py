"""Host training loop (SURVEY.md C17, call stack 3.1 build equivalent).

The device does all the math (one fused train_step); the host loop only
feeds data, logs structured metrics, and checkpoints.  Supports:

- data-parallel execution over a mesh (``parallel.data_parallel_step``)
- resume from the latest Orbax checkpoint (``--resume``)
- NaN guarding (``TrainConfig.debug_nans``; SURVEY.md section 5.2)
- fault injection for resume testing
  (``TrainConfig.fault_inject_step``; SURVEY.md section 5.3)
- JSONL metrics to stdout + optional TensorBoard-free scalar log file
  (SURVEY.md section 5.5)
"""

from __future__ import annotations

import json
import sys
import time
from typing import Callable, Iterator, Optional

import jax
import numpy as np

from pwstablenet_tpu.config import MeshConfig, ModelConfig, TrainConfig
from pwstablenet_tpu.parallel import (
    data_parallel_step,
    make_mesh_for_batch,
    replicate_tree,
    shard_batch,
)
from pwstablenet_tpu.train import checkpoint as ckpt
from pwstablenet_tpu.train.state import create_train_state
from pwstablenet_tpu.train.step import make_train_step


class FaultInjected(RuntimeError):
    """Raised by the debug fault-injection flag to test resume."""


def train(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    batch_iterator: Iterator[dict],
    mesh_cfg: Optional[MeshConfig] = None,
    resume: bool = False,
    max_steps: Optional[int] = None,
    log_fn: Optional[Callable[[dict], None]] = None,
    eval_fn: Optional[Callable[[object], dict]] = None,
):
    """Run adversarial training; returns the final TrainState."""
    if train_cfg.debug_nans:
        # SURVEY.md section 5.2: NaN hunts in GAN training
        jax.config.update("jax_debug_nans", True)
    state, (gen, disc, feat) = create_train_state(
        model_cfg, train_cfg, jax.random.PRNGKey(train_cfg.seed)
    )
    if resume:
        restored = ckpt.latest_step(train_cfg.checkpoint_dir)
        if restored is not None:
            state = ckpt.restore_state(train_cfg.checkpoint_dir, state)
            print(
                json.dumps({"event": "resumed", "step": int(state.step)}),
                file=sys.stderr,
            )

    mesh = make_mesh_for_batch(train_cfg.batch_size, mesh_cfg)
    step_fn = data_parallel_step(
        make_train_step(model_cfg, train_cfg, gen, disc, feat), mesh
    )
    state = replicate_tree(state, mesh)

    total = (
        max_steps
        if max_steps is not None
        else train_cfg.num_epochs * train_cfg.steps_per_epoch
    )
    log = log_fn or (lambda m: print(json.dumps(m), flush=True))
    closers = []
    if train_cfg.scalar_log_path:
        # SURVEY.md section 5.5: TensorBoard-free summary writer — the
        # same JSONL scalars appended to a file alongside stdout.
        inner_log = log
        scalar_file = open(train_cfg.scalar_log_path, "a", buffering=1)
        closers.append(scalar_file.close)

        def log(m, _inner=inner_log, _f=scalar_file):
            _f.write(json.dumps(m) + "\n")
            _inner(m)

    if train_cfg.tb_log_dir:
        # SURVEY.md section 5.5: TensorBoard event files (hand-encoded
        # TFRecord framing — no TF dependency; utils/tb_writer.py)
        from pwstablenet_tpu.utils.tb_writer import SummaryWriter

        tb = SummaryWriter(train_cfg.tb_log_dir)
        closers.append(tb.close)
        inner_log2 = log

        def log(m, _inner=inner_log2, _tb=tb):
            step = int(m.get("step", 0))
            _tb.add_scalars(
                {k: v for k, v in m.items() if k != "step"}, step
            )
            _inner(m)

    try:
        return _run_loop(
            state, step_fn, batch_iterator, mesh, train_cfg, total, log,
            eval_fn,
        )
    finally:
        for close in closers:
            close()


def _run_loop(
    state, step_fn, batch_iterator, mesh, train_cfg, total, log,
    eval_fn=None,
):
    # HOT LOOP.  Dispatch is asynchronous: step_fn returns device
    # futures immediately, so the host prepares batch N+1 (decode +
    # device_put) while the device runs step N.  Nothing in the loop
    # body blocks on the device except the periodic metrics fetch at
    # log_every — a host-side step counter replaces the per-step
    # ``int(state.step)`` sync that would otherwise serialize every
    # dispatch on this tunnel-attached TPU (30-100 ms/sync).
    step = int(state.step)  # one sync, at entry (covers resume)
    t_last = time.perf_counter()
    last_logged = step
    # best-eval tracking (GAN quality is non-monotonic): resume-aware,
    # but only when the eval configuration matches — a stale score from
    # a different eval clip/model would suppress all new best exports
    # (advisor finding, round 2)
    eval_fp = getattr(eval_fn, "fingerprint", None)
    prev_best = ckpt.best_step(train_cfg.checkpoint_dir)
    if prev_best is not None and prev_best.get("eval_fingerprint") != eval_fp:
        print(
            json.dumps({
                "event": "best_tracking_reset",
                "reason": "eval configuration changed since the recorded "
                          "best (fingerprint mismatch); starting fresh",
                "previous_best": prev_best,
            }),
            file=sys.stderr,
        )
        prev_best = None
    best_value = prev_best["value"] if prev_best else float("-inf")
    next_batch = shard_batch(
        jax.tree_util.tree_map(np.asarray, next(batch_iterator)), mesh
    )
    while step < total:
        batch = next_batch
        state, metrics = step_fn(state, batch)
        step += 1
        if step < total:
            next_batch = shard_batch(
                jax.tree_util.tree_map(np.asarray, next(batch_iterator)),
                mesh,
            )

        if train_cfg.fault_inject_step == step:
            jax.block_until_ready(state)
            raise FaultInjected(f"injected fault at step {step}")

        if step % train_cfg.log_every == 0 or step == total:
            scalars = {k: float(v) for k, v in metrics.items()}  # sync
            now = time.perf_counter()
            if train_cfg.debug_nans and not all(
                np.isfinite(v) for v in scalars.values()
            ):
                raise FloatingPointError(
                    f"non-finite metrics at step {step}: {scalars}"
                )
            scalars.update(
                step=step,
                sec_per_step=(now - t_last) / max(step - last_logged, 1),
            )
            t_last, last_logged = now, step
            log(scalars)

        if eval_fn is not None and (
            step == total
            or (train_cfg.eval_every > 0 and step % train_cfg.eval_every == 0)
        ):
            # held-out eval with the current inference weights (EMA when
            # tracked); rides the same log stream as training scalars
            scalars = {k: float(v) for k, v in eval_fn(state).items()}
            scalars["step"] = step
            log(scalars)
            # auto-track the best eval step: export the inference
            # weights to <ckpt_dir>/best + best_step.json so the best
            # weights survive checkpoint pruning (`--checkpoint-step
            # best` loads them)
            if "eval_stability" in scalars and (
                scalars["eval_stability"] > best_value
            ):
                best_value = scalars["eval_stability"]
                ckpt.save_best(
                    train_cfg.checkpoint_dir, state, step,
                    "eval_stability", best_value, fingerprint=eval_fp,
                )
                print(
                    json.dumps({
                        "event": "new_best", "step": step,
                        "eval_stability": best_value,
                    }),
                    file=sys.stderr,
                )

        if step % train_cfg.checkpoint_every == 0 or step == total:
            ckpt.save_state(
                train_cfg.checkpoint_dir, state, train_cfg.keep_checkpoints
            )
    return state


def synthetic_batch_iterator(
    model_cfg: ModelConfig, train_cfg: TrainConfig, seed: int = 0,
    rich: bool = False, **clip_kwargs,
) -> Iterator[dict]:
    """Endless synthetic DeepStab-like batches (for tests/smoke runs).

    Prefetched on a background thread (like the DeepStab loader) so
    host-side generation overlaps device compute in the train loop.
    ``rich=True`` enables the full scene model (``data.synthetic.RICH``).
    """
    from pwstablenet_tpu.data.synthetic import make_train_batch
    from pwstablenet_tpu.data.video_io import Prefetcher

    h, w = model_cfg.model_resolution

    def gen():
        i = seed
        while True:
            yield make_train_batch(
                train_cfg.batch_size, h, w, model_cfg.temporal_window,
                seed=i, rich=rich,
                temporal_center=model_cfg.temporal_center,
                **clip_kwargs,
            )
            i += 1

    return iter(Prefetcher(gen(), depth=2))
