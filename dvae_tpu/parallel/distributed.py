"""Multi-host (multi-process) runtime: the DCN layer of the framework.

The reference has no distributed backend at all — no ``torch.distributed``,
no NCCL/MPI init; its only cross-device mechanisms are a single-process
``nn.DataParallel`` (train_audio_net.py:150) and a same-host process pool
whose IPC is the filesystem (evaluate_ntcd_M1.py:248-259). The TPU-native
equivalent (SURVEY §5 "distributed communication backend") is:

* one ``jax.distributed.initialize()`` call per process — it MUST run
  before anything touches the XLA backend; after it, ``jax.devices()`` is
  the GLOBAL device list and every mesh built from it spans hosts; XLA
  routes collectives over ICI within a pod slice and DCN across slices,
  with no further involvement from this code;
* every host feeds only its own slice of each training batch to the
  devices it owns (:func:`distribute_batch` /
  :func:`global_batch_from_local` — no cross-host data movement);
* small result/metric trees come back to every host with
  :func:`gather_metrics` (DCN all-gather), replacing filesystem IPC;
* host-side side effects (checkpoints, logs) run on process 0 only
  (``jax.process_index() == 0`` guards in ``train/loop.py``).

``--multihost`` in the TRAINING CLIs wires this in. The enhancement sweep
deliberately stays per-process instead: its outputs are per-utterance wav
files and the sweep is resume-by-skip idempotent, so multi-host evaluation
is "run the eval CLI on each host with a disjoint --snr/noise slice (or
just concurrently — skip-if-exists dedupes)", exactly the reference's
failure-tolerant model with no coordination to get wrong.
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

    Must be called before any JAX operation that initializes the XLA
    backend (the CLIs call it straight after argument parsing); if the
    backend is already up, ``jax.distributed.initialize`` itself raises.
    """
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception:
        # includes "must be called before the backend initializes": with an
        # explicit cluster request that is a real ordering bug and must
        # surface; in auto-detect mode the caller decides — make_mesh_if
        # (--multihost) raises on a False return, library callers treat it
        # as "no multi-process runtime available"
        if explicit or num_processes not in (None, 1):
            raise  # a requested multi-process setup failing is an error
        return False  # nothing to auto-detect: stay single-process
    return jax.process_count() > 1


def global_batch_from_local(local_batch, mesh, axis: str = "data"):
    """Assemble a global batch-sharded array from per-process local data.

    Each process passes only ITS slice (local leaves of shape
    ``(global_batch / process_count, ...)``); the result is a global
    jax.Array sharded over ``axis`` whose addressable pieces are exactly the
    local data — no cross-host data movement. Single-process this is just
    ``shard_batch``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch,
    )


def distribute_batch(batch, mesh, axis: str = "data"):
    """Shard a host-replicated batch over a (possibly multi-process) mesh.

    Single-process: plain ``shard_batch`` (one device_put per leaf).
    Multi-process: every host holds the same full batch (the datasets read
    a shared filesystem); each host slices out its ``process_index`` rows
    and the global array is assembled from those local shards, so each
    host only feeds the devices it owns. Leading dims must divide the
    process count (the training loop wrap-pads to the mesh size, which is
    a multiple of it).
    """
    if jax.process_count() == 1:
        from dvae_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, mesh, axis)
    pc, pid = jax.process_count(), jax.process_index()

    def slice_local(x):
        per, rem = divmod(x.shape[0], pc)
        if rem:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by process_count={pc}"
            )
        return x[pid * per : (pid + 1) * per]

    return global_batch_from_local(jax.tree.map(slice_local, batch), mesh, axis)


def gather_metrics(tree):
    """All-gather a small pytree of per-process results to every host.

    Stacks a leading process axis on every leaf (process_allgather over DCN);
    single-process it returns the inputs with that length-1 axis, so callers
    are topology-agnostic. Use for metric tables / costs, never for bulk
    tensors (those belong on the mesh).
    """
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
