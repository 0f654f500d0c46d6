from omnihuman_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_FSDP,
    AXIS_SP,
    MeshConfig,
    create_mesh,
    local_mesh,
    named_sharding,
)
from omnihuman_tpu.parallel.partition import (
    infer_param_specs,
    shard_params,
    with_sharding_constraint,
)

__all__ = [
    "AXIS_DATA", "AXIS_FSDP", "AXIS_SP",
    "MeshConfig", "create_mesh", "local_mesh", "named_sharding",
    "infer_param_specs", "shard_params", "with_sharding_constraint",
]
