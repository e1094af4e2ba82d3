from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    param_specs,
    permute_qkv_params,
    qkv_head_permutation,
    shard_batch,
    shard_params,
    spmd_compatible,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "param_specs",
    "permute_qkv_params",
    "qkv_head_permutation",
    "shard_batch",
    "shard_params",
    "spmd_compatible",
]
