"""Orbax checkpointing (SURVEY.md C18 / section 5.3-5.4).

Saves the complete training state — generator/discriminator params,
both optimizer states, frozen feature params, PRNG key and step — so
``--resume`` restores training exactly.  The reference's
``torch.save(state_dict)`` equivalent for inference-only export is
``save_params`` / ``load_params``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from pwstablenet_tpu.train.state import TrainState


def _manager(directory: str, keep: int) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True
        ),
    )


def save_state(directory: str, state: TrainState, keep: int = 3) -> int:
    step = int(state.step)
    with _manager(directory, keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return step


def restore_state(
    directory: str, template: TrainState, step: Optional[int] = None
) -> TrainState:
    """Restore into the structure of ``template`` (shapes must match)."""
    with _manager(directory, keep=10_000) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {directory!r}")
        return mgr.restore(step, args=ocp.args.StandardRestore(template))


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    with _manager(directory, keep=10_000) as mgr:
        return mgr.latest_step()


def save_params(path: str, params) -> None:
    """Inference-only export (generator params)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params)
    ckpt.wait_until_finished()


def load_params(path: str, template=None):
    ckpt = ocp.StandardCheckpointer()
    if template is not None:
        return ckpt.restore(
            os.path.abspath(path), args=ocp.args.StandardRestore(template)
        )
    return ckpt.restore(os.path.abspath(path))


def load_generator_params(
    path: str, prefer_ema: bool = True, step: Optional[int] = None
):
    """Generator weights from EITHER kind of checkpoint path:

    - a training checkpoint directory (``CheckpointManager`` layout with
      numbered step subdirs, as written by the train loop): restores
      ``step`` (or the latest) TrainState pytree and returns its EMA
      weights when tracked (``TrainConfig.ema_decay``), else the raw
      generator params.  ``step`` enables best-step selection — GAN
      quality is non-monotonic, so pick the step the eval hook scored
      highest;
    - a ``save_params`` inference-only export: returned as-is.

    Lets ``stabilize --checkpoint`` point straight at ``--checkpoint-dir``
    without an explicit export step.
    """
    if step is None:
        step = latest_step(path)
    if step is None:
        return load_params(path)
    with _manager(path, keep=10_000) as mgr:
        state = mgr.restore(step)  # raw pytree (no template needed)
    ema = state.get("g_ema") if isinstance(state, dict) else None
    if prefer_ema and ema:  # non-empty dict => EMA was tracked
        return ema
    return state["g_params"]
