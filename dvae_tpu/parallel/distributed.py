"""Multi-host (multi-process) runtime: the DCN layer of the framework.

The reference has no distributed backend at all — no ``torch.distributed``,
no NCCL/MPI init; its only cross-device mechanisms are a single-process
``nn.DataParallel`` (train_audio_net.py:150) and a same-host process pool
whose IPC is the filesystem (evaluate_ntcd_M1.py:248-259). The TPU-native
equivalent (SURVEY §5 "distributed communication backend") is:

* one ``jax.distributed.initialize()`` call per process — after it,
  ``jax.devices()`` is the GLOBAL device list and every mesh built from it
  spans hosts; XLA routes collectives over ICI within a pod slice and DCN
  across slices, with no further involvement from this code;
* each host feeds its local shard of the batch
  (:func:`global_batch_from_local`) — the multi-host replacement for the
  reference's per-process file lists;
* small result/metric trees come back to every host with
  :func:`gather_metrics` (DCN all-gather), replacing filesystem IPC.

Everything degrades to a no-op single-process so the same script runs
unchanged on one chip, an 8-chip slice, or a multi-host pod
(``--multihost`` in the training/eval CLIs).
"""

from __future__ import annotations

import os

import jax


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the multi-process JAX runtime (idempotent).

    With no arguments, relies on ``jax.distributed.initialize``'s cluster
    auto-detection (TPU pod metadata / SLURM / standard JAX_* env vars). On a
    plain single process with nothing to detect, stays single-process and
    returns False. Returns True when the process joined a multi-process
    runtime (or already had).
    """
    if jax.process_count() > 1:
        return True  # already initialized
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception:
        if explicit or num_processes not in (None, 1):
            raise  # a requested multi-process setup failing is an error
        return False  # nothing to auto-detect: stay single-process
    return jax.process_count() > 1


def global_batch_from_local(local_batch, mesh, axis: str = "data"):
    """Assemble a global batch-sharded array from per-process local data.

    Each process passes only ITS shard (local leaves of shape
    ``(global_batch / process_count, ...)``); the result is a global jax.Array
    sharded over ``axis`` whose addressable pieces are exactly the local data
    — no cross-host data movement. Single-process this is just
    ``shard_batch``. This is the multi-host input-pipeline boundary: hosts
    read disjoint file lists (reference sharded them over pool workers,
    evaluate_ntcd_M1.py:249-252) and meet only on-device.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch,
    )


def gather_metrics(tree):
    """All-gather a small pytree of per-process results to every host.

    Stacks a leading process axis on every leaf (process_allgather over DCN);
    single-process it returns the inputs with that length-1 axis, so callers
    are topology-agnostic. Use for metric tables / costs, never for bulk
    tensors (those belong on the mesh).
    """
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
