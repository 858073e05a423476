#!/usr/bin/env python
"""Cross-engine parity harness: run OUR MCEM and the REFERENCE's torch MCEM
with identical trained weights on the same utterance and compare EM cost
trajectories, Wiener-mask statistics and output metrics.

This is the statistical-parity evidence for the enhancement engine (bitwise
parity is impossible: different RNGs drive the Metropolis-Hastings chain).
Requires the read-only reference checkout at /root/reference.

Usage: python scripts/parity_vs_reference.py [--niter 100] [--epochs 300]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dvae_tpu.data.datasets import FrameDataset
from dvae_tpu.data.io import read_wav
from dvae_tpu.enhance.mcem import McemConfig, run_mcem
from dvae_tpu.eval.pesq_native import pesq_wb
from dvae_tpu.eval.si_sdr import si_sdr_leroux
from dvae_tpu.eval.stoi import stoi
from dvae_tpu.models import VAE
from dvae_tpu.ops.stft import istft_np, stft
from dvae_tpu.train.steps import adam, init_train_state, make_train_step

SUBSET = "/root/reference/data/subset"


def train_small_m1(epochs: int):
    ds = FrameDataset(f"{SUBSET}/processed/ntcd_timit/Clean_ibm_labels_upsampled.h5", "train")
    model = VAE()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(ds._x[:8]),
    )
    tx = adam(1e-3)
    state = init_train_state(model, params, tx)
    step = make_train_step(model, tx, conditional=False)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for _ in range(epochs):
        for x, _ in ds.batches(128, rng):
            key, sk = jax.random.split(key)
            state, metrics = step(state, x, sk)
    if epochs < 1:
        raise SystemExit("--epochs must be >= 1 (the comparison needs a trained model)")
    print(f"trained M1 {epochs} epochs, final batch ELBO {float(metrics['elbo']):.2f}")
    return model, state.params


def export_to_torch_state_dict(params):
    """Shared weight bridge (train/torch_import.py) — reference naming."""
    from dvae_tpu.train.torch_import import export_torch_state_dict

    return export_torch_state_dict(params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--niter", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--utterances", type=int, default=1,
                    help="number of subset noisy utterances to compare "
                         "(ours runs them as ONE masked batch; the torch "
                         "reference loops per utterance)")
    ap.add_argument("--seeds", type=int, default=1,
                    help="MH-chain seeds per engine. With N>1 each engine "
                         "runs N times (ours: N PRNGKeys; reference: "
                         "np/torch re-seeded per run) and the table shows "
                         "mean +/- sd across seeds — the direct test of "
                         "whether a cross-engine delta is seed noise "
                         "(distributions overlap) or engine bias (they "
                         "separate)")
    ap.add_argument("--out", default=None, help="optional JSON output path")
    ap.add_argument("--f32-stats", action="store_true",
                    help="run our engine with fast_stats=False (f32 HBM "
                         "residency instead of the default bf16) — isolates "
                         "whether a cross-engine metric lean is "
                         "precision-induced or seed noise")
    args = ap.parse_args()

    import glob as _glob

    model, params = train_small_m1(args.epochs)

    noisy_paths = sorted(_glob.glob(
        f"{SUBSET}/raw/ntcd_timit/u/drspeech/data/TCDTIMIT/Noisy_TCDTIMIT/"
        "*/*/volunteers/*/straightcam/*.wav"))[: args.utterances]
    pairs = []
    for p in noisy_paths:
        tail = p.split("Noisy_TCDTIMIT/")[1]          # <type>/<snr>/volunteers/...
        clean = f"{SUBSET}/raw/ntcd_timit/Clean/volunteers/" + tail.split("volunteers/")[1]
        pairs.append((p, clean))
    if not pairs:
        raise SystemExit(f"no noisy subset utterances found under {SUBSET} — "
                         "is the reference checkout mounted?")
    if len(pairs) < args.utterances:
        print(f"note: only {len(pairs)} of {args.utterances} requested "
              "utterances ship in the subset")

    xs = [read_wav(p)[0] for p, _ in pairs]
    cleans = [read_wav(c)[0] for _, c in pairs]
    Xs = [np.asarray(stft(jnp.asarray(x, jnp.float32))) for x in xs]
    n_max = max(X.shape[0] for X in Xs)
    b = len(Xs)
    x2 = np.zeros((b, n_max, 513), np.float32)
    mask = np.zeros((b, n_max), np.float32)
    for i, X in enumerate(Xs):
        x2[i, : X.shape[0]] = np.abs(X) ** 2
        mask[i, : X.shape[0]] = 1.0
    x2 = jnp.asarray(x2)

    # ---- our engine: ONE masked batch over all utterances -----------------
    _, z0, _ = model.apply(params, x2.reshape(-1, 513), method="encode", sample=False)
    z0 = z0.reshape(b, n_max, -1)
    dec = lambda zz: model.apply(params, zz, method="decode")

    def run_ours(seed: int):
        t0 = time.perf_counter()
        # matched EFFECTIVE budgets: the reference's MCEM_M1 swallows its
        # first budget argument into an unused y parameter (reference
        # mcem.py:207 vs :297/:314), so it actually runs E-step 30/30 and
        # WF 75/30 no matter what it is constructed with — compare against
        # exactly that
        res = run_mcem(dec, x2, z0, jnp.asarray(mask), jax.random.PRNGKey(5 + seed),
                       McemConfig.m1_reference_effective(
                           niter=args.niter,
                           fast_stats=not args.f32_stats))
        jax.block_until_ready(res.wfs)
        elapsed = time.perf_counter() - t0
        rows = []
        for i, (X, x_noisy, s_clean) in enumerate(zip(Xs, xs, cleans)):
            wf = np.asarray(res.wfs[i, : X.shape[0]])
            s_hat = istft_np(wf * X, length=len(x_noisy)).astype(np.float64)
            rows.append({
                "wf_mean": float(wf.mean()),
                "wf_median": float(np.median(wf)),
                "si_sdr": si_sdr_leroux(s_hat, s_clean),
                "estoi": stoi(s_clean, s_hat, 16000),
                "pesq": pesq_wb(s_clean, s_hat, 16000),
            })
        agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        agg.update({"cost_first": float(res.cost[0]),
                    "cost_last": float(res.cost[-1]), "seconds": elapsed})
        return agg, rows

    # ---- reference engine (torch, CPU), one utterance at a time -----------
    sys.path.insert(0, "/root/reference")
    import torch

    from packages.models.mcem import MCEM_M1
    from packages.models.models import VariationalAutoencoder

    ref_model = VariationalAutoencoder([513, 16, [128, 128]])
    ref_model.load_state_dict(export_to_torch_state_dict(params))
    ref_model.eval()
    for q in ref_model.parameters():
        q.requires_grad = False

    # our batched cost is a masked mean over ALL valid cells (long utterances
    # weigh more); weight the per-utterance reference costs the same way
    frames = np.asarray([X.shape[0] for X in Xs], np.float64)
    wavg = lambda v: float(np.average(np.asarray(v), weights=frames))

    def run_ref(seed: int):
        # the reference pins np/torch seeds once at import (mcem.py:1-5);
        # re-seed per run so each seed gives an independent NMF init + chain
        np.random.seed(seed)
        torch.manual_seed(seed)
        rows, cost_first, cost_last, elapsed = [], [], [], 0.0
        for X, x_noisy, s_clean in zip(Xs, xs, cleans):
            S_ref = np.asarray(stft(jnp.asarray(s_clean, jnp.float32))).T
            n = min(S_ref.shape[1], X.shape[0])
            mcem = MCEM_M1(niter=args.niter)
            mcem.init_parameters(X=X[:n].T, S=S_ref[:, :n], vae=ref_model,
                                 nmf_rank=10, eps=1e-8, device="cpu")
            t0 = time.perf_counter()
            cost = mcem.run()
            elapsed += time.perf_counter() - t0
            wf_mag = np.abs(mcem.S_hat) / np.maximum(np.abs(X[:n].T), 1e-12)
            s_hat_ref = istft_np(mcem.S_hat.T, length=len(x_noisy)).astype(np.float64)
            cost_first.append(float(cost[0])); cost_last.append(float(cost[-1]))
            rows.append({
                "wf_mean": float(wf_mag.mean()),
                "wf_median": float(np.median(wf_mag)),
                "si_sdr": si_sdr_leroux(s_hat_ref, s_clean),
                "estoi": stoi(s_clean, s_hat_ref, 16000),
                "pesq": pesq_wb(s_clean, s_hat_ref, 16000),
            })
        agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        agg.update({"cost_first": wavg(cost_first),
                    "cost_last": wavg(cost_last), "seconds": elapsed})
        return agg, rows

    keys = ("cost_first", "cost_last", "wf_mean", "wf_median", "si_sdr",
            "estoi", "pesq", "seconds")
    ours_runs = [run_ours(s) for s in range(args.seeds)]
    ref_runs = [run_ref(s) for s in range(args.seeds)]
    ours, ours_rows = ours_runs[0]
    ref, ref_rows = ref_runs[0]

    if args.seeds == 1:
        print(f"(means over {b} utterance(s); niter={args.niter}, identical weights)")
        print(f"{'':<12}{'ours':>12}{'reference':>12}")
        for k in keys:
            print(f"{k:<12}{ours[k]:>12.4f}{ref[k]:>12.4f}")
    else:
        stat = lambda runs, k: (np.mean([a[k] for a, _ in runs]),
                                np.std([a[k] for a, _ in runs], ddof=1))
        print(f"(means over {b} utterance(s) x {args.seeds} seeds; "
              f"niter={args.niter}, identical weights; +/- is sd across seeds)")
        print(f"{'':<12}{'ours':>22}{'reference':>22}")
        for k in keys:
            om, os_ = stat(ours_runs, k)
            rm, rs = stat(ref_runs, k)
            print(f"{k:<12}{om:>14.4f} +/-{os_:>6.4f}{rm:>14.4f} +/-{rs:>6.4f}")
    if args.out:
        payload = {"ours": ours, "reference": ref,
                   "per_utterance": {"ours": ours_rows, "reference": ref_rows}}
        if args.seeds > 1:
            payload["per_seed"] = {"ours": [a for a, _ in ours_runs],
                                   "reference": [a for a, _ in ref_runs]}
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
