"""Device-mesh parallelism: DP batch sharding over ICI (shard_map, Pallas-
compatible), GSPMD tensor parallelism (2-D mesh), multi-host inputs."""
from .mesh import (
    batch_sharding,
    global_batch_from_local,
    make_mesh,
    make_parallel_train_step,
    replicated,
    shard_batch,
)
from .tp import make_tp_train_step, shard_state_tp, state_tp_shardings

__all__ = [
    "batch_sharding", "global_batch_from_local", "make_mesh",
    "make_parallel_train_step", "make_tp_train_step", "replicated",
    "shard_batch", "shard_state_tp", "state_tp_shardings",
]
