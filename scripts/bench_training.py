"""Training-throughput comparison: reference torch-CPU step vs dvae-tpu.

Times the M1 trainer's hot loop at the reference's production shape
(batch 128 of 513-dim power-spectrogram frames, Adam 1e-4 — reference
training_M1.py:46-58,122-139) three ways:

* the REFERENCE'S OWN torch stack on this host's CPU —
  ``packages.models.models.VariationalAutoencoder`` + ``utils.elbo`` +
  ``torch.optim.Adam``, imported from /root/reference (same in-memory
  harness as tests/test_torch_bridge.py's training-parity pin);
* our jitted single-step path (``make_train_step``) — one dispatch per
  optimizer step, so on a remote-attached chip the link RTT dominates;
* our production multi-step path (``make_multi_train_step``,
  ``--steps-per-dispatch`` in the trainer CLIs) — K optimizer steps per
  dispatch via ``lax.scan``.

Both sides consume the same real training frames (the shipped subset h5,
tiled to the batch size). Emits ONE JSON line; ``--out`` also writes it to
a file (evidence/training_throughput.json by convention).

This is an evidence script, not part of bench.py's contract — the driver's
benchmark stays the enhancement engine (BASELINE.md's headline).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REF = "/root/reference"


def _load_frames(batch: int) -> np.ndarray:
    """Real training frames: the subset h5's X_train (513, N), tiled and
    trimmed to (batch, 513) float32. Hosts without the reference tree
    (--skip-reference's target situation) get synthetic power frames —
    the step cost does not depend on the values."""
    import os

    path = (REF + "/data/subset/processed/ntcd_timit/"
                  "Clean_ibm_labels_upsampled.h5")
    if not os.path.exists(path):
        rng = np.random.default_rng(0)
        return (np.abs(rng.standard_normal((batch, 513))) + 0.1
                ).astype(np.float32)
    import h5py

    with h5py.File(path, "r") as f:
        x = np.asarray(f["X_train"][:], np.float32).T  # (N, 513)
    reps = -(-batch // x.shape[0])
    return np.tile(x, (reps, 1))[:batch]


def bench_reference_cpu(x: np.ndarray, steps: int, warmup: int,
                        lr: float) -> float:
    """Steps/s of the reference's own torch training step on CPU."""
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)  # 'packages' must resolve to the reference
    from packages.models.models import VariationalAutoencoder
    from packages.models.utils import elbo

    torch.manual_seed(0)
    model = VariationalAutoencoder([513, 16, [128, 128]])
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    xt = torch.tensor(x)

    def step():
        r, mu, logvar = model(xt)
        loss, _, _ = elbo(xt, r, mu, logvar, 1e-8)
        opt.zero_grad()
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    return steps / (time.perf_counter() - t0)


def bench_tpu(x: np.ndarray, steps: int, warmup: int, lr: float,
              group: int) -> tuple[float, float]:
    """(single-dispatch steps/s, K-steps-per-dispatch steps/s) of our
    jitted M1 train step on the default JAX platform."""
    import jax
    import jax.numpy as jnp

    from dvae_tpu.models.vae import VAE
    from dvae_tpu.train.steps import (adam, init_train_state,
                                      make_multi_train_step, make_train_step)

    model = VAE(x_dim=513, z_dim=16, h_dim=(128, 128))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        jnp.ones((2, 513)))
    tx = adam(lr)
    xj = jnp.asarray(x)

    # single dispatch per optimizer step (link RTT on the critical path)
    step1 = make_train_step(model, tx, conditional=False)
    state = init_train_state(model, params, tx)
    for i in range(warmup):
        state, _ = step1(state, xj, jax.random.PRNGKey(i))
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(steps):
        state, _ = step1(state, xj, jax.random.PRNGKey(1000 + i))
    jax.block_until_ready(state.params)
    single = steps / (time.perf_counter() - t0)

    # production path: K steps per dispatch (trainer --steps-per-dispatch).
    # K DISTINCT batches (rolled copies), so every scan step really reads
    # fresh rows from HBM like an epoch does
    stepk = make_multi_train_step(model, tx, conditional=False)
    xs = jnp.asarray(np.stack([np.roll(x, i, axis=0) for i in range(group)]))
    state = init_train_state(model, params, tx)
    state, _ = stepk(state, xs, jax.random.PRNGKey(0))  # compile
    jax.block_until_ready(state.params)
    n_disp = max(1, steps // group)
    t0 = time.perf_counter()
    for i in range(n_disp):
        state, _ = stepk(state, xs, jax.random.PRNGKey(2000 + i))
    jax.block_until_ready(state.params)
    grouped = n_disp * group / (time.perf_counter() - t0)
    return single, grouped


def bench_e2e_feeding(x: np.ndarray, steps: int, lr: float,
                      group: int) -> tuple[float, float]:
    """(host-fed, device-data) END-TO-END steps/s at K steps/dispatch —
    including what the epoch loop actually ships per dispatch: a fresh
    (K, B, F) float stack vs (K, B) int32 indices into a resident split
    (LoopConfig.device_data). The difference is pure wire traffic; the
    device program work is identical."""
    import jax
    import jax.numpy as jnp

    from dvae_tpu.models.vae import VAE
    from dvae_tpu.train.steps import (adam, init_train_state,
                                      make_gather_train_steps,
                                      make_multi_train_step)

    model = VAE(x_dim=513, z_dim=16, h_dim=(128, 128))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        jnp.ones((2, 513)))
    tx = adam(lr)
    batch = x.shape[0]
    n_disp = max(1, steps // group)

    # host-fed: a fresh stack crosses the link every dispatch (the
    # non-device-data epoch loop's traffic pattern)
    stepk = make_multi_train_step(model, tx, conditional=False)
    stacks = [np.stack([np.roll(x, i + 7 * j, axis=0) for i in range(group)])
              for j in range(2)]          # alternate two host buffers
    state = init_train_state(model, params, tx)
    state, _ = stepk(state, jnp.asarray(stacks[0]), jax.random.PRNGKey(0))
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for j in range(n_disp):
        state, _ = stepk(state, jnp.asarray(stacks[j % 2]),
                         jax.random.PRNGKey(3000 + j))
    jax.block_until_ready(state.params)
    hostfed = n_disp * group / (time.perf_counter() - t0)

    # device-data: the split lives on the device; only indices cross
    pool = np.tile(x, (max(1, 4096 // batch), 1))[:4096]
    data = jnp.asarray(pool)
    _g1, gmulti = make_gather_train_steps(model, tx, False, data)
    rng = np.random.default_rng(0)
    idx_bufs = [rng.integers(0, len(pool), (group, batch)).astype(np.int32)
                for _ in range(2)]
    state = init_train_state(model, params, tx)
    state, _ = gmulti(state, jnp.asarray(idx_bufs[0]), None,
                      jax.random.PRNGKey(0))
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for j in range(n_disp):
        state, _ = gmulti(state, jnp.asarray(idx_bufs[j % 2]), None,
                          jax.random.PRNGKey(4000 + j))
    jax.block_until_ready(state.params)
    devicedata = n_disp * group / (time.perf_counter() - t0)
    return hostfed, devicedata


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--group", type=int, default=100,
                    help="steps per dispatch for the multi-step path")
    ap.add_argument("--skip-reference", action="store_true",
                    help="only measure our side (no /root/reference)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (in-process pin — the env "
                         "var is overridden by the axon sitecustomize)")
    ap.add_argument("--out", help="also write the JSON line here")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from _lib import enable_jit_cache

    enable_jit_cache()

    x = _load_frames(args.batch)
    ref_sps = None
    if not args.skip_reference:
        ref_sps = bench_reference_cpu(x, args.steps, args.warmup, args.lr)
    single, grouped = bench_tpu(x, args.steps, args.warmup, args.lr,
                                args.group)
    e2e_host, e2e_dev = bench_e2e_feeding(x, args.steps, args.lr, args.group)

    result = {
        "metric": "m1_train_steps_per_sec",
        "batch": args.batch,
        "platform": jax.devices()[0].platform,
        "ref_cpu_steps_per_sec": round(ref_sps, 2) if ref_sps else None,
        "tpu_steps_per_sec_single_dispatch": round(single, 2),
        "tpu_steps_per_sec_grouped": round(grouped, 2),
        "group": args.group,
        "frames_per_sec_grouped": round(grouped * args.batch, 1),
        "speedup_vs_ref_cpu": (round(grouped / ref_sps, 1)
                               if ref_sps else None),
        "e2e_steps_per_sec_hostfed": round(e2e_host, 2),
        "e2e_steps_per_sec_device_data": round(e2e_dev, 2),
        "device_data_e2e_speedup": round(e2e_dev / e2e_host, 2),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
