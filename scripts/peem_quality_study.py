#!/usr/bin/env python
"""Paired PEEM-vs-MCEM quality matrix across the model families.

The PEEM engine (enhance/mcem.py::run_peem — gradient point-estimate EM,
~5x device speedup) was round-2-evidenced on ONE family (M1, SI-SDR only).
This harness runs the full promotion protocol: for each family x label
source x EM budget, enhance the subset test sweep (3 utterances x 3 noise
types at SNR -5) with

  * MCEM at --seeds different chain keys  -> mean +/- spread per metric
  * PEEM once (deterministic masks)       -> delta vs the MCEM mean,
                                             in MCEM-seed-spread units

scoring SI-SDR (Le Roux), ESTOI, and native wideband PESQ (structural
P.862.2 — comparable within this framework) of s_est against the clean
utterance, 0.05 s edge trim. Mirrors the reference's engine-per-family
grid (/root/reference/packages/models/mcem.py:182,332,504,676); label
sources follow the eval CLIs (oracle h5 labels) and the serving surfaces
(self-soft = the model's own classifier on the NOISY mixture).

Writes one JSON (evidence/peem_quality_matrix.json) and prints a markdown
table (PARITY.md section 2b).

Usage (models trained by the round-3 subset grid):
  python scripts/peem_quality_study.py --models-root /tmp/dvae_r3/models \
      --data-root /tmp/dvae_r3/data --out evidence/peem_quality_matrix.json
"""

import argparse
import json
import os
import time

from _lib import enable_jit_cache

UTTS = ("sa1", "sa2", "si494")
NOISES = ("Babble", "Car", "LR")
SNR = "-5"


def family_specs():
    """name -> (model_dir glob, model class name, y_dim, y_mode, label
    sources). Label sources: none / oracle-vad / oracle-ibm / self-soft."""
    return {
        "m1": ("ntcd_M1_nonorm_*", "VAE", None, "none", ["none"]),
        "m2_vad": ("ntcd_M2_VAD_nonorm_*", "CVAE", 1, "enc_dec",
                   ["oracle-vad"]),
        "m2_ibm": ("ntcd_M2_IBM_nonorm_*", "CVAE", 513, "enc_dec",
                   ["oracle-ibm"]),
        "m2v2_vad": ("ntcd_M2v2_VAD_nonorm_*", "CVAE_v2", 1, "dec_only",
                     ["oracle-vad"]),
        "v3": ("ntcd_M2v3_VAD_Uloss_alpha_0.0_nonorm_*", "CVAE_v3", 1,
               "dec_only", ["self-soft", "oracle-vad"]),
        "v4": ("ntcd_M2v4_VAD_alpha_10.0_beta_10.0_*", "CVAE_v4", 1,
               "dec_only", ["self-soft"]),
        "v5": ("ntcd_M2_info_VAD_Lenc_aux_v1_*", "DisentangledVAE", 1,
               "dec_only", ["self-soft", "oracle-vad"]),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models-root", required=True)
    ap.add_argument("--data-root", required=True,
                    help="parent of subset/ (per-utterance ibm label h5s "
                         "must exist — create_audio_train_set --labels "
                         "ibm_labels)")
    ap.add_argument("--out", default="evidence/peem_quality_matrix.json")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--niters", type=int, nargs="+", default=[100, 500])
    ap.add_argument("--families", nargs="+", default=None,
                    help="subset of %s" % list(family_specs()))
    ap.add_argument("--engines", nargs="+",
                    default=["mcem", "peem"],
                    choices=["mcem", "peem", "peem-wf", "pmcem"],
                    help="engines per cell; the first is the baseline the "
                         "others' deltas are computed against. pmcem "
                         "(parallel-chain MCEM) is stochastic like mcem "
                         "and runs the full seed set")
    ap.add_argument("--pmcem-chains", type=int, default=None)
    ap.add_argument("--pmcem-steps", type=int, default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) before first use")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    enable_jit_cache()

    import glob as globmod
    import pathlib

    import jax
    import numpy as np

    import dvae_tpu.models as M
    from dvae_tpu.data.io import read_wav
    from dvae_tpu.enhance.evaluate import load_oracle_labels
    from dvae_tpu.enhance.labeling import classify_method_of, self_soft_labels
    from dvae_tpu.enhance.mcem import McemConfig
    from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
    from dvae_tpu.eval.pesq_native import pesq_wb
    from dvae_tpu.eval.si_sdr import si_sdr_leroux
    from dvae_tpu.eval.stoi import stoi
    from dvae_tpu.models import init_params
    from dvae_tpu.ops.stft import StftConfig
    from dvae_tpu.train import checkpoint as ckpt

    proc = os.path.join(args.data_root, "subset", "processed", "ntcd_timit")
    stft = StftConfig()

    # -- the 9-utterance sweep ------------------------------------------------
    noisy, clean, vads, ibms = [], [], [], []
    for noise in NOISES:
        for utt in UTTS:
            x, _ = read_wav(f"{proc}/Noisy/{noise}/{SNR}/test/34M/{utt}.wav")
            s, _ = read_wav(f"{proc}/Clean/test/34M/{utt}.wav")
            noisy.append(x.astype(np.float32))
            clean.append(s.astype(np.float32))
            vads.append(load_oracle_labels(
                f"{proc}/Clean/test/34M/{utt}_vad_labels_upsampled.h5"))
            p_ibm = f"{proc}/Clean/test/34M/{utt}_ibm_labels_upsampled.h5"
            ibms.append(load_oracle_labels(p_ibm)
                        if os.path.exists(p_ibm) else None)

    trim = int(0.05 * stft.fs)

    def score(outs):
        rows = []
        for (s_est, _), s in zip(outs, clean):
            a, b = trim, min(len(s), len(s_est)) - trim
            rows.append((float(si_sdr_leroux(s_est[a:b], s[a:b])),
                         float(stoi(s[a:b], s_est[a:b], stft.fs,
                                    extended=True)),
                         float(pesq_wb(s[a:b], s_est[a:b], stft.fs))))
        return np.asarray(rows)  # (9, 3): si_sdr, estoi, pesq

    def labels_for(source, model, params, y_dim, model_class):
        if source == "none":
            return None
        if source == "oracle-vad":
            return vads
        if source == "oracle-ibm":
            assert all(y is not None for y in ibms), \
                "per-utterance ibm h5s missing (create_audio_train_set)"
            return ibms
        return self_soft_labels(model, params, noisy, stft, y_dim,
                                classify_method_of(model_class))

    base = score([(x, None) for x in noisy]).mean(axis=0)
    results = {"protocol": {
        "sweep": f"{len(noisy)} utterances: {NOISES} x {UTTS} @ SNR {SNR}",
        "seeds": args.seeds, "niters": args.niters,
        "metrics": "si_sdr (LeRoux) / estoi / native pesq_wb vs clean, "
                   "0.05s edge trim",
        # wall_s is a QUALITY-study byproduct, not an engine-speed
        # measurement: host wall for all seeds of the cell-engine,
        # including its cold XLA compile on first dispatch (minutes over
        # the axon tunnel) and per-dispatch fetch RTT. Engine speed
        # comparisons belong to bench.py's device_ms_per_batch.
        "wall_s_semantics": "host wall across all seeds incl. cold "
                            "compile + fetch RTT; NOT device time — see "
                            "bench.py device_ms_per_batch for engine "
                            "speed",
        "platform": None, "date": time.strftime("%Y-%m-%d"),
    }, "input_baseline": {  # the unenhanced mixtures, same scorer
        "si_sdr": round(float(base[0]), 3), "estoi": round(float(base[1]), 4),
        "pesq": round(float(base[2]), 3),
    }, "cells": []}

    specs = family_specs()
    for fam in (args.families or specs):
        dir_glob, cls_name, y_dim, y_mode, sources = specs[fam]
        hits = sorted(globmod.glob(os.path.join(args.models_root, dir_glob)))
        if not hits:
            print(f"[{fam}] no model dir matches {dir_glob} — skipping")
            continue
        model_dir = hits[0]
        cls = getattr(M, cls_name)
        if y_dim is None:
            model = cls(x_dim=513, z_dim=16, h_dim=(128, 128))
            init_args = (np.ones((4, 513), np.float32),)
        else:
            model = cls(x_dim=513, y_dim=y_dim, z_dim=16, h_dim=(128, 128))
            init_args = (np.ones((4, 513), np.float32),
                         np.ones((4, y_dim), np.float32))
        params_t = init_params(
            model, {"params": jax.random.PRNGKey(0),
                    "sample": jax.random.PRNGKey(1)}, *init_args)
        path = ckpt.best_checkpoint(model_dir)
        params = ckpt.load_checkpoint(path, params_t)
        model_class = {"CVAE_v3": "v3", "CVAE_v4": "v4",
                       "DisentangledVAE": "v5"}.get(cls_name)
        if results["protocol"]["platform"] is None:
            results["protocol"]["platform"] = jax.devices()[0].platform
        print(f"[{fam}] {os.path.basename(path)}")

        for source in sources:
            ys = labels_for(source, model, params, y_dim, model_class)
            for niter in args.niters:
                cell = {"family": fam, "labels": source, "niter": niter,
                        "checkpoint": os.path.basename(path)}
                for engine in args.engines:
                    mkw = {}
                    if args.pmcem_chains is not None:
                        mkw["pmcem_chains"] = args.pmcem_chains
                    if args.pmcem_steps is not None:
                        mkw["pmcem_steps"] = args.pmcem_steps
                    enh = Enhancer(model, params, EnhancerConfig(
                        mcem=McemConfig(niter=niter, **mkw), y_mode=y_mode,
                        engine=engine))
                    keys = (range(args.seeds)
                            if engine != "peem" else (0,))
                    per_seed = []
                    t0 = time.time()
                    for seed in keys:
                        outs = enh.enhance_batch(
                            noisy, ys, key=jax.random.PRNGKey(100 + seed))
                        per_seed.append(score(outs))
                    per_seed = np.asarray(per_seed)  # (S, 9, 3)
                    means = per_seed.mean(axis=1)    # (S, 3) sweep means
                    cell[engine] = {
                        "si_sdr": round(float(means[:, 0].mean()), 3),
                        "estoi": round(float(means[:, 1].mean()), 4),
                        "pesq": round(float(means[:, 2].mean()), 3),
                        "wall_s": round(time.time() - t0, 1),
                    }
                    if len(per_seed) > 1:
                        cell[engine]["seed_std"] = {
                            "si_sdr": round(float(means[:, 0].std()), 3),
                            "estoi": round(float(means[:, 1].std()), 4),
                            "pesq": round(float(means[:, 2].std()), 3)}
                base_name = args.engines[0]
                base_cell = cell[base_name]
                std = base_cell.get("seed_std", {})
                for other in args.engines[1:]:
                    d = {k: round(cell[other][k] - base_cell[k],
                                  4 if k == "estoi" else 3)
                         for k in ("si_sdr", "estoi", "pesq")}
                    cell[f"{other}_minus_{base_name}"] = d
                    cell[f"{other}_delta_in_seed_stds"] = {
                        k: (round(d[k] / std[k], 2) if std.get(k) else None)
                        for k in d}
                results["cells"].append(cell)
                extras = "  ".join(
                    f"{o} d=({cell[f'{o}_minus_{base_name}']['si_sdr']:+.2f} dB, "
                    f"{cell[f'{o}_minus_{base_name}']['estoi']:+.4f}, "
                    f"{cell[f'{o}_minus_{base_name}']['pesq']:+.2f})"
                    for o in args.engines[1:])
                print(f"  {source:>10} niter={niter}: "
                      f"{base_name} {base_cell['si_sdr']:+.2f} dB / "
                      f"{base_cell['estoi']:.3f} / "
                      f"{base_cell['pesq']:.2f}  {extras}", flush=True)

    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {args.out}")

    # markdown table for PARITY.md section 2b
    base = args.engines[0]
    others = args.engines[1:]
    head = " | ".join(f"{o} Δ (in σ units)" for o in others)
    print(f"\n| family | labels | niter | {base} si_sdr/estoi/pesq "
          f"(±σ seeds) | {head} |")
    print("|---|---|---|---|" + "---|" * len(others))
    for c in results["cells"]:
        m = c[base]
        sd = m.get("seed_std", {})
        cols = []
        for o in others:
            d, z = c[f"{o}_minus_{base}"], c[f"{o}_delta_in_seed_stds"]
            cols.append(f"{d['si_sdr']:+.2f} dB ({z['si_sdr']}σ), "
                        f"{d['estoi']:+.4f} ({z['estoi']}σ), "
                        f"{d['pesq']:+.2f} ({z['pesq']}σ)")
        print(f"| {c['family']} | {c['labels']} | {c['niter']} "
              f"| {m['si_sdr']:+.2f}±{sd.get('si_sdr', 0):.2f} dB, "
              f"{m['estoi']:.3f}±{sd.get('estoi', 0):.3f}, "
              f"{m['pesq']:.2f}±{sd.get('pesq', 0):.2f} | "
              + " | ".join(cols) + " |")


if __name__ == "__main__":
    main()
