"""Multi-host runtime helpers (dvae_tpu/parallel/distributed.py) on the
virtual 8-device CPU mesh: single-process no-op contracts, local->global
batch assembly, and metric gathering."""

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.parallel import (
    distributed_init,
    gather_metrics,
    global_batch_from_local,
    make_mesh,
    shard_batch,
)


def test_distributed_init_single_process_noop():
    # nothing to auto-detect in this environment: stays single-process
    assert distributed_init() is False
    assert jax.process_count() == 1


def test_global_batch_from_local_matches_shard_batch():
    mesh = make_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    batch = {"x": x, "y": np.arange(16, dtype=np.int32)}
    g = global_batch_from_local(batch, mesh)
    s = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
    assert g["x"].sharding == s["x"].sharding
    np.testing.assert_array_equal(np.asarray(g["x"]), x)
    np.testing.assert_array_equal(np.asarray(g["y"]), batch["y"])
    # result is usable inside jit like any sharded batch
    total = jax.jit(lambda b: jnp.sum(b["x"]) + jnp.sum(b["y"]))(g)
    assert float(total) == x.sum() + batch["y"].sum()


def test_distribute_batch_single_process_equals_shard_batch():
    mesh = make_mesh()
    from dvae_tpu.parallel import distribute_batch

    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    d = distribute_batch((x, x[:, 0]), mesh)
    s = shard_batch((jnp.asarray(x), jnp.asarray(x[:, 0])), mesh)
    assert d[0].sharding == s[0].sharding
    np.testing.assert_array_equal(np.asarray(d[0]), x)
    np.testing.assert_array_equal(np.asarray(d[1]), x[:, 0])


def test_multihost_flag_fails_loudly_without_cluster():
    """--multihost with no detectable cluster must error, not silently run
    every host as an independent single process (review finding)."""
    import subprocess, sys, pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(root / "scripts" / "training_M1.py"),
         "--multihost", "--end-epoch", "2", "--platform", "cpu",
         "--data-root", "/nonexistent"],
        capture_output=True, text=True, cwd=root,
    )
    assert r.returncode != 0
    assert "multihost" in (r.stderr + r.stdout)


def test_gather_metrics_single_process_shape():
    out = gather_metrics({"loss": jnp.float32(2.5), "n": np.int32(7)})
    # leading process axis of size process_count (1 here)
    assert out["loss"].shape == (1,)
    np.testing.assert_allclose(out["loss"][0], 2.5)
    assert out["n"][0] == 7
