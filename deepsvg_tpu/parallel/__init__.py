"""Device-mesh parallelism: DP batch sharding over ICI, multi-host inputs."""
from .mesh import (
    batch_sharding,
    global_batch_from_local,
    make_mesh,
    make_parallel_train_step,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding", "global_batch_from_local", "make_mesh",
    "make_parallel_train_step", "replicated", "shard_batch",
]
