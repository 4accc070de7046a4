from pwstablenet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_step,
    make_mesh,
    make_mesh_for_batch,
    replicate_tree,
    replicated,
    shard_batch,
)
from pwstablenet_tpu.parallel.spatial import (  # noqa: F401
    spatial_sharded_warp,
)
from pwstablenet_tpu.parallel.multihost import (  # noqa: F401
    maybe_initialize_distributed,
    process_info,
)
