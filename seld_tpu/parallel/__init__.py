from seld_tpu.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS  # noqa: F401
from seld_tpu.parallel.multihost import (  # noqa: F401
    device_batch,
    global_batch_array,
    initialize_multihost,
    local_batch_size,
    process_local_indices,
)
from seld_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_partition_spec,
    shard_variables,
    state_shardings,
)
