from multi_modal_early_exit_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    default_mesh_shape,
)
from multi_modal_early_exit_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_partition_specs,
    shard_batch,
    shard_params,
)
