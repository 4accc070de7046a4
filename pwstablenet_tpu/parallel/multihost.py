"""Multi-host initialization (SURVEY.md section 5.8 comm backend).

The reference's parallelism ends at single-process ``nn.DataParallel``.
Here every strategy is expressed over a ``jax.sharding.Mesh``, which is
already multi-host transparent: once ``jax.distributed`` is initialized
on every process, ``jax.devices()`` is the GLOBAL device list,
``make_mesh`` builds a global mesh, and the same ``data_parallel_step``
/ clip-sharded / spatially-sharded code paths run unchanged — XLA
routes collectives over ICI within a slice and DCN across slices.

On TPU pods the coordinator/process topology comes from the runtime
environment, so ``maybe_initialize_distributed()`` with no arguments is
all a launcher script needs; single-process runs are a no-op.
"""

from __future__ import annotations

from typing import Optional

import jax

_initialized = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` for multi-host execution.

    Returns True if initialization ran, False for the single-process
    no-op (no arguments given and no multi-host environment detected).
    Idempotent within a process.
    """
    global _initialized
    if _initialized:
        return True
    explicit = coordinator_address is not None
    import os

    env_driven = any(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not explicit and not env_driven:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except ValueError:
        # environment hinted at multi-host but lacks a usable
        # coordinator (e.g. single-process dev boxes): stay single-host
        return False
    _initialized = True
    return True


def process_info() -> dict:
    """Topology snapshot for logs: process index/count, local/global
    device counts."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
