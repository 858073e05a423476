#!/usr/bin/env python
"""Cross-engine parity harness: run OUR MCEM and the REFERENCE's torch MCEM
with identical trained weights on the same utterance and compare EM cost
trajectories, Wiener-mask statistics and output metrics.

This is the statistical-parity evidence for the enhancement engine (bitwise
parity is impossible: different RNGs drive the Metropolis-Hastings chain).
Requires the read-only reference checkout at /root/reference.

Covers all engine families via ``--model``: m1 (MCEM_M1), m2 (MCEM_M2 —
IBM-conditioned encoder+decoder) and m2v2 (MCEM_M2v2, decoder-only
conditioning; the reference's MCEM_M2v3 body is line-identical).

Usage: python scripts/parity_vs_reference.py [--model m2] [--niter 100]
       [--epochs 300] [--utterances 6] [--seeds 10]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax

# OUR engine runs on CPU by default (self-contained statistical comparison,
# no dependence on the TPU tunnel); `--platform axon` runs our side on the
# real chip while the torch reference stays on CPU — evidence that the
# parity statistics are hardware-independent, and a same-inputs wall-clock
# comparison. Peeked from argv (not argparse) because the platform must be
# pinned before the first backend touch below.
_plat = "cpu"
for _i, _a in enumerate(sys.argv):
    if _a == "--platform" and _i + 1 < len(sys.argv):
        _plat = sys.argv[_i + 1]
    elif _a.startswith("--platform="):  # argparse's --platform=axon form
        _plat = _a.split("=", 1)[1]
jax.config.update("jax_platforms", _plat)

from _lib import enable_jit_cache  # noqa: E402  (scripts/ is on sys.path)

enable_jit_cache()  # repeat runs skip the minutes-cold MCEM compile

import jax.numpy as jnp
import numpy as np

from dvae_tpu.data.datasets import FrameDataset
from dvae_tpu.data.io import read_wav
from dvae_tpu.enhance.mcem import McemConfig, run_mcem
from dvae_tpu.eval.pesq_native import pesq_wb
from dvae_tpu.eval.si_sdr import si_sdr_leroux
from dvae_tpu.eval.stoi import stoi
from dvae_tpu.models import CVAE, CVAE_v2, VAE
from dvae_tpu.ops.stft import istft_np, stft_to_host
from dvae_tpu.ops.targets import clean_speech_ibm
from dvae_tpu.train.steps import adam, init_train_state, make_train_step

SUBSET = "/root/reference/data/subset"


def train_small(kind: str, epochs: int):
    """Train a small model of the requested family on the shipped subset
    frame h5 (IBM labels, y_dim=513 — the only frame-level label type the
    subset ships, and the conditioning used by the reference's golden
    ntcd_M2_IBM family)."""
    if epochs < 1:
        raise SystemExit("--epochs must be >= 1 (the comparison needs a trained model)")
    ds = FrameDataset(f"{SUBSET}/processed/ntcd_timit/Clean_ibm_labels_upsampled.h5", "train")
    conditional = kind != "m1"
    model = {"m1": VAE, "m2": CVAE, "m2v2": CVAE_v2}[kind](
        **({"y_dim": ds.y_dim} if conditional else {})
    )
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    xa = jnp.asarray(ds._x[:8])
    if conditional:
        params = model.init(rngs, xa, jnp.asarray(ds._y[:8]))
    else:
        params = model.init(rngs, xa)
    tx = adam(1e-3)
    state = init_train_state(model, params, tx)
    step = make_train_step(model, tx, conditional=conditional)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for _ in range(epochs):
        for x, y in ds.batches(128, rng):
            key, sk = jax.random.split(key)
            state, metrics = (step(state, x, y, sk) if conditional
                              else step(state, x, sk))
    print(f"trained {kind} {epochs} epochs, final batch ELBO "
          f"{float(metrics['elbo']):.2f}")
    return model, state.params


def export_to_torch_state_dict(params):
    """Shared weight bridge (train/torch_import.py) — reference naming."""
    from dvae_tpu.train.torch_import import export_torch_state_dict

    return export_torch_state_dict(params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="m1", choices=["m1", "m2", "m2v2"],
                    help="engine family to compare: m1 = MCEM_M1 (with the "
                         "reference's effective-budget quirk matched), "
                         "m2 = MCEM_M2 (IBM-conditioned encoder AND decoder, "
                         "budgets honored), m2v2 = MCEM_M2v2 (decoder-only "
                         "conditioning). The reference's MCEM_M2v3 engine "
                         "body is line-identical to MCEM_M2v2 (mcem.py:676 "
                         "vs :504 — they differ only in comments), so m2v2 "
                         "covers that class too.")
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
    ap.add_argument("--platform", default="cpu", choices=["cpu", "axon", "tpu"],
                    help="jax platform for OUR engine (the torch reference "
                         "always runs on CPU). 'axon'/'tpu' measures parity "
                         "with our side on the real chip — consumed before "
                         "argparse at module import (see top of file)")
    ap.add_argument("--f32-stats", action="store_true",
                    help="run our engine with fast_stats=False (f32 HBM "
                         "residency instead of the default bf16) — isolates "
                         "whether a cross-engine metric lean is "
                         "precision-induced or seed noise")
    args = ap.parse_args()

    import glob as _glob

    model, params = train_small(args.model, args.epochs)
    conditional = args.model != "m1"

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

    # stft_to_host: complex dtypes cannot be read back over the axon tunnel
    Xs = [stft_to_host(x) for x in xs]
    Ss = [stft_to_host(s) for s in cleans]
    # both engines must see the SAME frame span: the torch leg trims each
    # utterance to min(clean, mixture) frames (the reference's video-trim
    # idiom), so ours masks to exactly that count too — otherwise a
    # clean/noisy length mismatch would feed the engines different inputs
    # and the comparison would measure input mismatch, not engine delta
    n_utt = [min(S.shape[0], X.shape[0]) for S, X in zip(Ss, Xs)]
    n_max = max(n_utt)
    b = len(Xs)
    x2 = np.zeros((b, n_max, 513), np.float32)
    mask = np.zeros((b, n_max), np.float32)
    y_np = np.zeros((b, n_max, 513), np.float32) if conditional else None
    for i, X in enumerate(Xs):
        n = n_utt[i]
        x2[i, :n] = np.abs(X[:n]) ** 2
        mask[i, :n] = 1.0
        if conditional:
            # oracle IBM from the clean spectrogram — the reference's eval
            # conditioning for its golden ntcd_M2_IBM family; BOTH engines
            # receive this identical y, so label-generation parity (tested
            # separately in tests/test_targets.py) is not in play here
            # upload the magnitude, not the complex spectrogram: complex
            # host->device transfers also fail over the axon tunnel, and
            # clean_speech_ibm takes abs() first anyway
            y_np[i, :n] = np.asarray(clean_speech_ibm(
                jnp.asarray(np.abs(Ss[i][:n]), np.float32)))
    x2 = jnp.asarray(x2)
    y_j = jnp.asarray(y_np) if conditional else None

    # ---- our engine: ONE masked batch over all utterances -----------------
    if args.model == "m2":
        # MCEM_M2: encoder saw [x; y] (reference mcem.py:365)
        enc_in = jnp.concatenate([x2, y_j], axis=-1).reshape(-1, 513 + 513)
    else:
        # M1 and M2v2: encoder saw x alone (mcem.py:201, :537)
        enc_in = x2.reshape(-1, 513)
    _, z0, _ = model.apply(params, enc_in, method="encode", sample=False)
    z0 = z0.reshape(b, n_max, -1)
    dec = lambda zz: model.apply(params, zz, method="decode")

    def run_ours(seed: int):
        t0 = time.perf_counter()
        # m1: matched EFFECTIVE budgets — the reference's MCEM_M1 swallows
        # its first budget argument into an unused y parameter (reference
        # mcem.py:207 vs :297/:314), so it actually runs E-step 30/30 and
        # WF 75/30 no matter what it is constructed with — compare against
        # exactly that. The M2 variants pass self.y and HONOR their nominal
        # budgets (mcem.py:468/:486), so m2/m2v2 compare at the defaults.
        if args.model == "m1":
            cfg = McemConfig.m1_reference_effective(
                niter=args.niter, fast_stats=not args.f32_stats)
        else:
            cfg = McemConfig(niter=args.niter, fast_stats=not args.f32_stats)
        res = run_mcem(dec, x2, z0, jnp.asarray(mask), jax.random.PRNGKey(5 + seed),
                       cfg, y=y_j)
        jax.block_until_ready(res.wfs)
        elapsed = time.perf_counter() - t0
        rows = []
        for i, (X, x_noisy, s_clean) in enumerate(zip(Xs, xs, cleans)):
            wf = np.asarray(res.wfs[i, : n_utt[i]])
            s_hat = istft_np(wf * X[: n_utt[i]],
                             length=len(x_noisy)).astype(np.float64)
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

    from packages.models import mcem as ref_mcem
    from packages.models import models as ref_models

    if args.model == "m1":
        ref_model = ref_models.VariationalAutoencoder([513, 16, [128, 128]])
        ref_cls = ref_mcem.MCEM_M1
    elif args.model == "m2":
        ref_model = ref_models.DeepGenerativeModel(
            [513, 513, 16, [128, 128]], classifier=None)
        ref_cls = ref_mcem.MCEM_M2
    else:
        ref_model = ref_models.DeepGenerativeModel_v2(
            [513, 513, 16, [128, 128]], classifier=None)
        ref_cls = ref_mcem.MCEM_M2v2
    ref_model.load_state_dict(export_to_torch_state_dict(params))
    ref_model.eval()
    for q in ref_model.parameters():
        q.requires_grad = False

    # our batched cost is a masked mean over ALL valid cells (long utterances
    # weigh more); weight the per-utterance reference costs the same way
    frames = np.asarray(n_utt, np.float64)
    wavg = lambda v: float(np.average(np.asarray(v), weights=frames))

    def run_ref(seed: int):
        # the reference pins np/torch seeds once at import (mcem.py:1-5);
        # re-seed per run so each seed gives an independent NMF init + chain
        np.random.seed(seed)
        torch.manual_seed(seed)
        rows, cost_first, cost_last, elapsed = [], [], [], 0.0
        for i, (X, x_noisy, s_clean) in enumerate(zip(Xs, xs, cleans)):
            S_ref = Ss[i].T
            n = min(S_ref.shape[1], X.shape[0])
            mcem = ref_cls(niter=args.niter)
            kw = {}
            if conditional:  # (y_dim, N) float tensor, same oracle IBM
                kw["y"] = torch.tensor(y_np[i, :n].T.copy())
            mcem.init_parameters(X=X[:n].T, S=S_ref[:, :n], vae=ref_model,
                                 nmf_rank=10, eps=1e-8, device="cpu", **kw)
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
