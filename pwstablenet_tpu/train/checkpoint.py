"""Orbax checkpointing (SURVEY.md C18 / section 5.3-5.4).

Saves the complete training state — generator/discriminator params,
both optimizer states, frozen feature params, PRNG key and step — so
``--resume`` restores training exactly.  The reference's
``torch.save(state_dict)`` equivalent for inference-only export is
``save_params`` / ``load_params``.

Best-step tracking (SURVEY.md section 5.5; GAN quality is
non-monotonic): the train loop calls ``save_best`` whenever the eval
hook reports a new best score — the generator's inference weights (EMA
when tracked) are exported to ``<dir>/best`` and the step/score are
recorded in ``<dir>/best_step.json``.  ``load_generator_params(path,
step="best")`` (CLI: ``--checkpoint-step best``) loads that export, so
the best weights survive checkpoint pruning (``keep_checkpoints``).
"""

from __future__ import annotations

import json
import os
import sys
from typing import List, Optional, Union

import jax
import orbax.checkpoint as ocp

from pwstablenet_tpu.train.state import TrainState

BEST_FILE = "best_step.json"
BEST_DIR = "best"


def _manager(
    directory: str, keep: int, create: bool = True
) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=create
        ),
    )


def _numbered_steps(directory: str) -> List[int]:
    """Saved step numbers, probed WITHOUT instantiating a manager (a
    read-only query must not write manager metadata into arbitrary user
    paths — advisor finding, round 1)."""
    if not os.path.isdir(directory):
        return []
    steps = []
    for name in os.listdir(directory):
        if name.isdigit() and os.path.isdir(os.path.join(directory, name)):
            steps.append(int(name))
    return sorted(steps)


def save_state(directory: str, state: TrainState, keep: int = 3) -> int:
    step = int(state.step)
    with _manager(directory, keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return step


def restore_state(
    directory: str,
    template: TrainState,
    step: Optional[int] = None,
    reconcile_ema: bool = True,
) -> TrainState:
    """Restore into the structure of ``template`` (shapes must match).

    ``reconcile_ema`` handles resuming with a different ``--ema-decay``
    on/off setting than the original run (the checkpoint's ``g_ema``
    presence then mismatches the template): the EMA is either dropped
    (checkpoint has one, run doesn't track it) or re-initialized from
    the restored generator params (run tracks one, checkpoint doesn't),
    with a stderr notice either way — instead of an opaque orbax
    structure error (advisor finding, round 1).
    """
    steps = _numbered_steps(directory)
    if step is None:
        step = steps[-1] if steps else None
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {directory!r}")
    elif steps and step not in steps:
        raise FileNotFoundError(
            f"step {step} not found in {directory!r}; available: {steps}"
        )
    with _manager(directory, keep=10_000, create=False) as mgr:
        try:
            return mgr.restore(step, args=ocp.args.StandardRestore(template))
        except Exception:
            if not reconcile_ema:
                raise
            ckpt_has_ema = _checkpoint_has_ema(mgr, step)
            template_has_ema = template.g_ema is not None
            if ckpt_has_ema == template_has_ema:
                raise  # not an EMA-presence mismatch — surface the real error
            if ckpt_has_ema and not template_has_ema:
                # restore WITH an EMA slot, then drop it
                t2 = template.replace(
                    g_ema=jax.tree_util.tree_map(lambda x: x, template.g_params)
                )
                restored = mgr.restore(step, args=ocp.args.StandardRestore(t2))
                print(
                    json.dumps({
                        "event": "ema_dropped_on_resume",
                        "reason": "checkpoint tracks an EMA but this run "
                                  "has ema_decay=0",
                    }),
                    file=sys.stderr,
                )
                return restored.replace(g_ema=None)
            # run tracks an EMA but the checkpoint has none: restore
            # without the slot and re-init the EMA from the restored params
            t2 = template.replace(g_ema=None)
            restored = mgr.restore(step, args=ocp.args.StandardRestore(t2))
            print(
                json.dumps({
                    "event": "ema_initialized_on_resume",
                    "reason": "this run tracks an EMA but the checkpoint "
                              "has none; starting it at the restored params",
                }),
                file=sys.stderr,
            )
            import jax.numpy as jnp

            return restored.replace(
                g_ema=jax.tree_util.tree_map(jnp.copy, restored.g_params)
            )


def _checkpoint_has_ema(mgr: ocp.CheckpointManager, step: int) -> bool:
    """Whether the saved pytree carries a non-empty g_ema subtree.

    Probed from the saved tree-structure metadata (``_METADATA`` JSON
    written by StandardSave) — restoring the whole checkpoint just to
    peek at one key would double restore cost/peak memory (advisor
    finding, round 2).  Falls back to a full structure-free restore if
    the metadata file is missing or unparseable.
    """
    meta_path = os.path.join(
        str(mgr.directory), str(step), "default", "_METADATA"
    )
    try:
        with open(meta_path) as f:
            tree_meta = json.load(f)["tree_metadata"]
        # _METADATA is orbax-private: before trusting the probe, require
        # the layout we understand to hold for EVERY entry (key_metadata
        # = list of {"key": ...}, value_metadata carries "value_type")
        # and for at least one non-g_ema entry to exist (a train-state
        # tree always has g_params/step/etc).  A future orbax that still
        # parses as JSON but moved the semantics falls through to the
        # full-restore fallback instead of mis-answering silently.
        probed = None
        saw_other = False
        for entry in tree_meta.values():
            keys = [k["key"] for k in entry["key_metadata"]]
            vtype = entry["value_metadata"]["value_type"]
            if not isinstance(vtype, str):
                raise ValueError("unexpected _METADATA value_type")
            if keys and keys[0] == "g_ema":
                if probed is None:
                    # a bare ('g_ema',) None/empty leaf means no EMA
                    probed = vtype not in (
                        "None", "Dict", "dict",
                    ) or len(keys) > 1
            elif keys:
                saw_other = True
        if not saw_other:
            raise ValueError(
                "_METADATA lists no non-g_ema entries; layout not trusted"
            )
        return bool(probed)
    except Exception:
        pass
    try:
        raw = mgr.restore(step)  # structure-free restore (fallback)
        ema = raw.get("g_ema") if isinstance(raw, dict) else None
        return bool(ema)
    except Exception:
        return False


def latest_step(directory: str) -> Optional[int]:
    steps = _numbered_steps(directory)
    return steps[-1] if steps else None


def save_params(path: str, params) -> None:
    """Inference-only export (generator params)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params, force=True)
    ckpt.wait_until_finished()


def load_params(path: str, template=None):
    ckpt = ocp.StandardCheckpointer()
    if template is not None:
        return ckpt.restore(
            os.path.abspath(path), args=ocp.args.StandardRestore(template)
        )
    return ckpt.restore(os.path.abspath(path))


def save_best(
    directory: str, state: TrainState, step: int, metric: str, value: float,
    fingerprint: Optional[str] = None,
) -> None:
    """Record a new best eval score: export the inference weights (EMA
    when tracked) to ``<directory>/best`` and write ``best_step.json``.
    Called by the train loop; survives checkpoint pruning.

    ``fingerprint`` identifies the eval configuration (clip + model) so
    a resume with a DIFFERENT eval setup doesn't compare scores across
    incomparable configurations (advisor finding, round 2)."""
    from pwstablenet_tpu.train.state import generator_params

    os.makedirs(directory, exist_ok=True)
    save_params(
        os.path.join(directory, BEST_DIR),
        jax.device_get(generator_params(state)),
    )
    record = {"step": int(step), "metric": metric, "value": float(value)}
    if fingerprint is not None:
        record["eval_fingerprint"] = fingerprint
    with open(os.path.join(directory, BEST_FILE), "w") as f:
        json.dump(record, f)


def best_step(directory: str) -> Optional[dict]:
    """The recorded best-eval step info ({step, metric, value}), or None."""
    path = os.path.join(directory, BEST_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def load_generator_params(
    path: str,
    prefer_ema: bool = True,
    step: Optional[Union[int, str]] = None,
):
    """Generator weights from EITHER kind of checkpoint path:

    - a training checkpoint directory (``CheckpointManager`` layout with
      numbered step subdirs, as written by the train loop): restores
      ``step`` (or the latest) TrainState pytree and returns its EMA
      weights when tracked (``TrainConfig.ema_decay``), else the raw
      generator params.  ``step`` enables best-step selection — GAN
      quality is non-monotonic, so pick the step the eval hook scored
      highest; ``step="best"`` loads the auto-tracked best export
      (``save_best`` — robust to checkpoint pruning);
    - a ``save_params`` inference-only export: returned as-is.

    Lets ``stabilize --checkpoint`` point straight at ``--checkpoint-dir``
    without an explicit export step.
    """
    if step == "best":
        info = best_step(path)
        best_dir = os.path.join(path, BEST_DIR)
        if info is None or not os.path.isdir(best_dir):
            raise FileNotFoundError(
                f"no best-step record in {path!r} (run training with "
                "--eval-every so the loop can track the best eval score)"
            )
        return load_params(best_dir)
    steps = _numbered_steps(path)
    if step is None:
        step = steps[-1] if steps else None
    elif step not in steps:
        hint = ""
        info = best_step(path)
        if info is not None:
            hint = (
                f"; 'best' export available (step {info['step']}, "
                f"{info['metric']}={info['value']:.4f})"
            )
        raise FileNotFoundError(
            f"step {step} not found in {path!r} — available: {steps} "
            f"(older steps are pruned by keep_checkpoints){hint}"
        )
    if step is None:
        return load_params(path)
    with _manager(path, keep=10_000, create=False) as mgr:
        state = mgr.restore(step)  # raw pytree (no template needed)
    ema = state.get("g_ema") if isinstance(state, dict) else None
    if prefer_ema and ema:  # non-empty dict => EMA was tracked
        return ema
    return state["g_params"]
