from .mesh import (
    batch_sharding,
    initialize_distributed,
    make_dp_tp_mesh,
    make_mesh,
    mesh_for_batch,
    training_mesh,
    param_shardings,
    replicate,
    replicated,
    shard_batch,
    reshard_train_state,
    shard_params,
)

__all__ = [
    "mesh_for_batch",
    "training_mesh",
    "batch_sharding",
    "initialize_distributed",
    "make_dp_tp_mesh",
    "make_mesh",
    "param_shardings",
    "replicate",
    "replicated",
    "shard_batch",
    "reshard_train_state",
    "shard_params",
]
