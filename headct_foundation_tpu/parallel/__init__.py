from headct_foundation_tpu.parallel.mesh import (
    MESH_AXES,
    batch_sharding,
    make_mesh,
    mesh_from_config,
    param_shardings,
    replicated,
)

__all__ = [
    "MESH_AXES",
    "batch_sharding",
    "make_mesh",
    "mesh_from_config",
    "param_shardings",
    "replicated",
]
