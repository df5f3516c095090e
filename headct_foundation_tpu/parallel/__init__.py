from headct_foundation_tpu.parallel.mesh import (
    MESH_AXES,
    batch_sharding,
    make_mesh,
    mesh_from_config,
    param_shardings,
    replicated,
)
from headct_foundation_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_layer_params,
    unstack_layer_params,
)

__all__ = [
    "MESH_AXES",
    "batch_sharding",
    "make_mesh",
    "mesh_from_config",
    "param_shardings",
    "pipeline_apply",
    "replicated",
    "stack_layer_params",
    "unstack_layer_params",
]
