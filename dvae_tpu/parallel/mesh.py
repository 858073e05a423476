"""Device-mesh construction and sharding helpers.

The reference's only parallelism is a single-node ``nn.DataParallel``
(train_audio_net.py:150) and a process pool that shards utterances over GPUs
for evaluation (evaluate_ntcd_M1.py:248-259). The TPU-native equivalent is
one SPMD program over a ``jax.sharding.Mesh``:

* training: batch sharded over the ``data`` axis, params replicated — XLA
  emits the gradient all-reduces over ICI;
* enhancement: the padded utterance batch is sharded over ``data`` so each
  chip runs the MCEM scan on its shard; no host fan-out, no filesystem IPC.

Models here are ~0.2 M params, so tensor/pipeline parallelism would be pure
overhead; the mesh is 1-D. The helpers still take an ``axis`` name so larger
meshes (e.g. ('data', 'model')) can reuse them.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        # Default platform can't supply the requested mesh size (e.g. one
        # real TPU chip tunnelled in while the caller wants an 8-way dry run
        # under --xla_force_host_platform_device_count). Fall back to the
        # virtual CPU devices, which that flag multiplies.
        devices = jax.devices("cpu")
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only {len(devices)} "
                f"devices exist (set XLA_FLAGS=--xla_force_host_platform_"
                f"device_count={n_devices} to emulate on CPU)"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard leading (batch) dim of every leaf over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
