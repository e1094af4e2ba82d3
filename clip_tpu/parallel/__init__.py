from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    param_specs,
    shard_batch,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "param_specs",
    "shard_batch",
    "shard_params",
]
