from dvae_tpu.parallel.distributed import (
    distribute_batch,
    distributed_init,
    gather_metrics,
    global_batch_from_local,
)
from dvae_tpu.parallel.mesh import make_mesh, replicate, shard_batch

__all__ = [
    "distribute_batch",
    "distributed_init",
    "gather_metrics",
    "global_batch_from_local",
    "make_mesh",
    "replicate",
    "shard_batch",
]
