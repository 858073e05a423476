"""Subprocess worker for the two-process distributed test.

Launched twice by tests/test_parallel.py::test_two_process_training with
``XLA_FLAGS=--xla_force_host_platform_device_count=4``: each process joins a
2-process JAX runtime (8 global CPU devices), runs a short mesh-sharded
fit_vae with multi-step dispatch, exercises gather_metrics across hosts, and
dumps its observations as JSON for the parent to assert on. This executes the
real ``process_count() > 1`` branches of parallel/distributed.py (per-host
batch slicing, make_array_from_process_local_data, DCN all-gather) and the
process-0 checkpoint/log guards in train/loop.py.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


class SyntheticFrames:
    """Deterministic in-memory stand-in for data.datasets.FrameDataset:
    every process materializes the identical array, like hosts reading one
    shared filesystem."""

    def __init__(self, n=64, x_dim=33, seed=0):
        rng = np.random.default_rng(seed)
        self.x = np.abs(rng.standard_normal((n, x_dim))).astype(np.float32) + 0.1
        self.y = (rng.uniform(size=(n, 1)) > 0.5).astype(np.float32)

    def __len__(self):
        return len(self.x)

    def batches(self, batch_size, rng=None, drop_last=False):
        idx = np.arange(len(self.x))
        if rng is not None:
            rng.shuffle(idx)
        for i in range(0, len(idx), batch_size):
            sel = idx[i : i + batch_size]
            if drop_last and len(sel) < batch_size:
                return
            yield self.x[sel], self.y[sel]


def run_training(mesh, model_dir, steps_per_dispatch=2, end_epoch=3):
    from dvae_tpu.models import VAE
    from dvae_tpu.train.loop import LoopConfig, fit_vae

    cfg = LoopConfig(batch_size=16, start_epoch=1, end_epoch=end_epoch,
                     log_interval=1, seed=0,
                     steps_per_dispatch=steps_per_dispatch)
    model = VAE(x_dim=33, z_dim=4, h_dim=(8,))
    train = SyntheticFrames(n=64, seed=0)
    valid = SyntheticFrames(n=32, seed=1)
    return fit_vae(model, train, valid, model_dir, "M1", False, cfg, mesh=mesh)


def main():
    coordinator, rank, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    out_dir = pathlib.Path(out_dir)

    import jax

    # the axon sitecustomize overrides JAX_PLATFORMS from the env; pin
    # in-process BEFORE the backend initializes (see .claude/skills/verify)
    jax.config.update("jax_platforms", "cpu")

    from dvae_tpu.parallel import distributed_init, gather_metrics, make_mesh

    joined = distributed_init(coordinator, 2, rank)
    assert joined is True, "distributed_init must report a joined runtime"
    assert jax.process_count() == 2 and jax.process_index() == rank
    assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8

    mesh = make_mesh(8)
    model_dir = out_dir / "models"
    _, history = run_training(mesh, model_dir)

    gathered = gather_metrics({"rank": np.float32(rank),
                               "tag": np.float32(10 * (rank + 1))})

    result = {
        "rank": rank,
        "history": [
            {"epoch": h["epoch"], "train_elbo": h["train"]["elbo"],
             "valid_elbo": h["valid"]["elbo"]}
            for h in history
        ],
        "gathered_rank": np.asarray(gathered["rank"]).tolist(),
        "gathered_tag": np.asarray(gathered["tag"]).tolist(),
        "checkpoints": sorted(p.name for p in model_dir.glob("*.msgpack")),
        "logs": sorted(p.name for p in model_dir.glob("*.log")),
    }
    (out_dir / f"result_{rank}.json").write_text(json.dumps(result))


if __name__ == "__main__":
    main()
