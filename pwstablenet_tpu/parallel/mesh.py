"""Device mesh and sharding helpers (SURVEY.md section 2.3).

The reference's only parallelism is single-process ``nn.DataParallel``
over local GPUs (NCCL replicate/gather).  The TPU-native equivalent is
SPMD over a 1-D ``jax.sharding.Mesh``:

- **training**: parameters and optimizer state replicated, the batch
  sharded over the ``data`` axis; XLA's SPMD partitioner inserts the
  gradient all-reduce over ICI automatically — the NCCL all-reduce the
  reference relied on becomes a compiler-inserted collective.
- **inference**: a long video's temporal windows are embarrassingly
  parallel after window stacking, so clips are sharded over the same
  axis ("clip-sharded inference", SURVEY.md section 5.7) — the TPU
  analogue of the reference's nonexistent sequence parallelism.

The same code runs on one chip (trivial mesh), a v5e-8 slice, or a
virtual ``--xla_force_host_platform_device_count`` CPU mesh (how the
multi-device tests and the driver's dry-run validate sharding without a
pod).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from pwstablenet_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = jax.devices()
    n = len(devices) if cfg.num_devices in (-1, 0) else cfg.num_devices
    return Mesh(np.asarray(devices[:n]), (cfg.data_axis,))


def make_mesh_for_batch(
    batch_size: int, cfg: Optional[MeshConfig] = None
) -> Mesh:
    """Largest usable mesh whose size divides the global batch."""
    cfg = cfg or MeshConfig()
    devices = jax.devices()
    limit = len(devices) if cfg.num_devices in (-1, 0) else cfg.num_devices
    n = max(d for d in range(1, limit + 1) if batch_size % d == 0)
    return Mesh(np.asarray(devices[:n]), (cfg.data_axis,))


def batch_sharding(mesh: Mesh, axis: Optional[str] = None) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    axis = axis or mesh.axis_names[0]
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def data_parallel_step(
    train_step: Callable, mesh: Mesh
) -> Callable:
    """Jit a ``train_step(state, batch)`` for data-parallel execution:
    state replicated, batch sharded on its leading axis.  Gradient
    all-reduce is inserted by the SPMD partitioner.

    The incoming state is donated: params + two Adam states dominate HBM
    (hundreds of MB at full size), and the step consumes its input state,
    so XLA can update in place instead of holding both copies live.
    """
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, shard),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch onto the mesh, sharded over the data axis."""
    shard = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, shard), batch
    )


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
