#!/usr/bin/env python
"""Audio vs video vs audio-visual VAD: the fusion-quality dossier.

The reference's test-time conditioning labels came from a VIDEO classifier
in its sibling audio-visual-vad repo (reference README.md:6); its loaders
assemble audio-visual triples (packages/data_handling.py:225-330) but no
AV classifier, trainer, or measurement ships anywhere. dvae-tpu carries all
three modalities (train_audio_net.py, train_video_net.py --modality
video|av) — this harness produces the evidence that the FUSION is worth
carrying:

1. (--train) trains the three VADs on the same split at MATCHED budgets
   (same hidden/emb/layers/epochs/seed);
2. predicts per-frame labels for every test utterance per acoustic
   condition (predict_vad_labels.py --modality audio|video|av — audio and
   AV read the per-condition NOISY mixtures, video reads the lip h5s and
   is acoustics-independent);
3. reports F1/precision/recall PER NOISE CONDITION against the oracle VAD
   labels — the fusion hypothesis is that audio degrades with acoustic
   noise where video holds, and AV >= max(audio, video);
4. (--enhance-model-dir) closes the loop: label-conditioned enhancement
   (evaluate_ntcd_M2.py --y-source classifier) per modality vs oracle
   conditioning, scored SI-SDR (LeRoux) / ESTOI / native wideband PESQ
   against the clean utterances — the conditioning delta each label
   source costs.

Writes one JSON (default evidence/av_fusion_matrix.json) and prints
markdown tables for PARITY.md.

Usage (data root built by create_train_set + create_audio_train_set +
create_video_train_files):
  python scripts/av_fusion_study.py --data-root /tmp/r4/data \
      --models-root /tmp/r4/models --train --epochs 60 \
      --enhance-model-dir /tmp/r4/models/ntcd_M2_VAD_nonorm_... \
      --out evidence/av_fusion_matrix.json
"""

import argparse
import glob
import json
import os
import pathlib
import subprocess
import sys
import time

SCRIPTS = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(SCRIPTS.parent))   # dvae_tpu importable from anywhere


def run(argv, **kw):
    print("+", " ".join(map(str, argv)), flush=True)
    r = subprocess.run([sys.executable] + [str(a) for a in argv],
                       cwd=SCRIPTS.parent, text=True, capture_output=True,
                       **kw)
    if r.returncode != 0:
        raise RuntimeError(f"{argv[0]} failed rc={r.returncode}:\n"
                           f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}")
    return r.stdout


def f1_prec_rec(pred, ref):
    """(F1, precision, recall) via the ONE tested implementation every
    scoring surface uses (models/losses.py::f1_loss — the swap-proof
    helper guarding against the reference's precision/recall swap); a
    private copy here could drift and make the dossier's F1 subtly
    non-comparable with predict_vad_labels/run_metrics output."""
    from dvae_tpu.models.losses import f1_loss

    _, prec, rec, f1 = f1_loss(pred, ref)
    return float(f1), float(prec), float(rec)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", required=True,
                    help="parent of subset/ (video h5s + noisy tree built)")
    ap.add_argument("--models-root", required=True)
    ap.add_argument("--out", default="evidence/av_fusion_matrix.json")
    ap.add_argument("--train", action="store_true",
                    help="train the three VADs first (matched budgets)")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--emb-dim", type=int, default=32)
    ap.add_argument("--num-layers", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--train-split", default=None,
                    help="catalog split the VAD trainers train on (passed "
                         "through to train_audio_net/train_video_net). "
                         "'test' = the LABEL-PRODUCER regime: the nets "
                         "train on the sweep speaker's own utterances, "
                         "emulating the reference's in-distribution "
                         "deployment (its sibling-repo classifier was "
                         "trained on the full 600-speaker corpus, so test "
                         "speakers were in distribution) — the STRONG "
                         "operating point of the round-3 loop's F1-0.969 "
                         "video VAD")
    ap.add_argument("--valid-split", default=None)
    ap.add_argument("--run-tag", default="",
                    help="suffix for the model-dir/prediction/output names "
                         "so a second protocol (e.g. the strong-operating-"
                         "point leg) never clobbers the matched-budget "
                         "study's artifacts")
    ap.add_argument("--enhance-model-dir", default=None,
                    help="an M2(VAD) model dir: run the conditioned-"
                         "enhancement legs (oracle + 3 modalities)")
    ap.add_argument("--niter", type=int, default=100)
    ap.add_argument("--snr", default="-5")
    ap.add_argument("--platform", default=None,
                    help="platform for the PREDICT/ENHANCE legs (the "
                         "trainers get --platform cpu: small LSTMs, and "
                         "one axon client at a time)")
    ap.add_argument("--train-platform", default="cpu")
    args = ap.parse_args()

    import numpy as np

    data_root = pathlib.Path(args.data_root)
    models_root = pathlib.Path(args.models_root)
    proc = data_root / "subset" / "processed" / "ntcd_timit"
    noisy_root = proc / "Noisy"
    # the CATALOG's subset grid, not the filesystem's: the shipped subset
    # tree carries a Car/ extra the reference's own subset grid excludes
    # (reference ntcd_timit.py:250 — ['Babble', 'LR']), and the predict/
    # evaluate CLIs walk the catalog
    from dvae_tpu.data.catalog.ntcd_timit import _grids

    noise_types, snrs = _grids("subset")
    if str(args.snr) not in snrs:
        raise SystemExit(
            f"--snr {args.snr} is not in the catalog's subset grid {snrs}: "
            "the predict/enhance legs would write conditions the F1 sweep "
            "never reads (fail now, before the expensive training legs)")
    conditions = sorted(
        (t, s) for t in noise_types for s in snrs
        if s == str(args.snr) and (noisy_root / t / s).is_dir())
    common = ["--dataset-size", "subset", "--data-root", str(data_root),
              "--models-root", str(models_root)]

    tag = f"_{args.run_tag}" if args.run_tag else ""
    results = {"protocol": {
        "budgets": {"epochs": args.epochs, "hidden": args.hidden,
                    "emb_dim": args.emb_dim, "num_layers": args.num_layers,
                    "seed": args.seed},
        "splits": {"train": args.train_split or "train",
                   "valid": args.valid_split or "validation"},
        "conditions": [f"{t}/{s}" for t, s in conditions],
        "date": time.strftime("%Y-%m-%d"),
    }, "training": {}, "f1_per_condition": {}, "enhancement": {}}

    names = {
        "audio": f"ntcd_audio_vad_lstm_{args.hidden}x{args.num_layers}"
                 f"_norm{tag}",
        "video": f"ntcd_video_vad_{args.hidden}x{args.num_layers}"
                 f"_norm{tag}",
        "av": f"ntcd_av_vad_{args.hidden}x{args.num_layers}_norm{tag}",
    }

    # ---- 1. matched-budget training -------------------------------------
    shape = ["--hidden", args.hidden, "--num-layers", args.num_layers,
             "--end-epoch", args.epochs, "--seed", args.seed, "--std-norm",
             "--platform", args.train_platform]
    for flag, v in (("--train-split", args.train_split),
                    ("--valid-split", args.valid_split)):
        if v:
            shape += [flag, v]
    if args.train:
        t0 = time.time()
        run([SCRIPTS / "train_audio_net.py", *common, *shape,
             "--run-name", names["audio"]])
        results["training"]["audio_s"] = round(time.time() - t0, 1)
        for modality in ("video", "av"):
            t0 = time.time()
            run([SCRIPTS / "train_video_net.py", *common, *shape,
                 "--modality", modality, "--emb-dim", args.emb_dim,
                 "--run-name", names[modality]])
            results["training"][f"{modality}_s"] = round(time.time() - t0, 1)

    def latest(pattern):
        hits = sorted(glob.glob(str(models_root / pattern)))
        if not hits:
            raise FileNotFoundError(f"no model dir matches {pattern} "
                                    "(run with --train first)")
        return hits[-1]

    if args.run_tag:
        dirs = {m: str(models_root / names[m]) for m in names}
        for d in dirs.values():
            if not os.path.isdir(d):
                raise FileNotFoundError(f"{d} missing (run with --train)")
    else:
        # resolve by the EXACT shape the flags describe (hidden x layers),
        # not a bare wildcard: with 64x1 and 128x1 dirs side by side a
        # lexical latest() would pick the wrong shape and the predict leg
        # would crash on a checkpoint mismatch after the training legs.
        # Trailing 'norm' keeps run-tagged dirs (…_norm_<tag>) out of the
        # untagged protocol's resolution.
        hl = f"{args.hidden}x{args.num_layers}"
        dirs = {"audio": latest(f"ntcd_audio_vad_lstm_{hl}*norm"),
                "video": latest(f"ntcd_video_vad_{hl}*norm"),
                "av": latest(f"ntcd_av_vad_{hl}*norm")}
    results["checkpoints"] = {k: os.path.basename(v) for k, v in dirs.items()}

    # Record what the model dirs ACTUALLY trained, from the checkpoints
    # themselves — never from --epochs (round-4 lesson: a run without
    # --train recorded the CLI default, 60, while the dirs held 150-epoch
    # runs; the doc/evidence contradiction took a verdict to catch).
    for modality, mdir in dirs.items():
        rows = [json.load(open(j)) for j in
                sorted(glob.glob(os.path.join(mdir, "*_epoch_*.json")))]
        if not rows:
            continue
        best = min(rows, key=lambda m: m["valid_bce"])
        results["training"][modality] = {
            "epochs_trained": len(rows),
            "best_vloss_epoch": best["epoch"],
            "best_valid_bce": round(best["valid_bce"], 4),
            "best_checkpoint_valid_f1": round(best["valid_f1"], 4),
            "final_epoch_valid_f1": round(rows[-1]["valid_f1"], 4),
            "max_valid_f1_any_epoch": round(
                max(m["valid_f1"] for m in rows), 4),
        }
    trained = {v["epochs_trained"] + 1
               for v in results["training"].values()
               if isinstance(v, dict) and "epochs_trained" in v}
    if len(trained) == 1:
        results["protocol"]["budgets"]["epochs"] = trained.pop()
    elif trained:
        # the modalities' checkpoint-derived counts DISAGREE (a resumed or
        # longer run in one dir): a single headline budget would be a lie,
        # and silently keeping args.epochs is exactly the round-4
        # doc/evidence drift this block exists to prevent — record the
        # disagreement instead of a number
        results["protocol"]["budgets"]["epochs"] = None
        results["protocol"]["budgets"]["epochs_mismatch"] = {
            m: v["epochs_trained"] + 1
            for m, v in results["training"].items()
            if isinstance(v, dict) and "epochs_trained" in v}
        print("WARNING: modalities trained different epoch counts "
              f"({results['protocol']['budgets']['epochs_mismatch']}); "
              "budgets.epochs recorded as null — this is NOT a "
              "matched-budget run", flush=True)
    results["protocol"]["budgets"]["epochs_arg"] = args.epochs

    # ---- 2. predictions per modality ------------------------------------
    preds_root = models_root / f"av_study_preds{tag}"
    for modality, mdir in dirs.items():
        out = preds_root / modality
        argv = [SCRIPTS / "predict_vad_labels.py", *common,
                "--modality", modality, "--model-dir", mdir,
                "--hidden", args.hidden, "--num-layers", args.num_layers,
                "--std-norm", "--output-dir", out, "--overwrite",
                "--snr", args.snr]
        if modality != "audio":
            # video: per-utterance clean layout by construction; av:
            # per-condition noisy layout by construction (the CLI rejects
            # an explicit --source for both)
            argv += ["--emb-dim", args.emb_dim]
        if args.platform:
            argv += ["--platform", args.platform]
        run(argv)

    # ---- 3. F1 per condition --------------------------------------------
    import h5py

    import functools

    @functools.lru_cache(maxsize=None)
    def oracle_vad(spk_dir, utt):
        # cached: the modality x condition x utterance triple loop would
        # otherwise re-open every oracle h5 3 x C times
        with h5py.File(proc / "Clean" / "test" / spk_dir /
                       f"{utt}_vad_labels_upsampled.h5", "r") as f:
            y = np.asarray(f["Y"][()] if "Y" in f else f[list(f)[0]][()])
        return (y.reshape(-1) > 0.5).astype(np.int32)

    test_utts = []
    for spk in sorted((proc / "Clean" / "test").iterdir()):
        if spk.is_dir():
            for wav in sorted(spk.glob("*.wav")):
                test_utts.append((spk.name, wav.stem))

    table = {}
    for modality in dirs:
        per_cond = {}
        for (ntype, snr) in conditions:
            preds, refs = [], []
            for spk, utt in test_utts:
                if modality == "video":
                    p = (preds_root / modality / "ntcd_timit" / "Clean" /
                         "test" / spk / f"{utt}_y_hat_hard.npy")
                else:
                    p = (preds_root / modality / "ntcd_timit" / "Noisy" /
                         ntype / snr / "test" / spk /
                         f"{utt}_y_hat_hard.npy")
                yh = np.load(p).reshape(-1)
                yr = oracle_vad(spk, utt)
                n = min(len(yh), len(yr))
                preds.append((yh[:n] > 0.5).astype(np.int32))
                refs.append(yr[:n])
            f1, prec, rec = f1_prec_rec(np.concatenate(preds),
                                        np.concatenate(refs))
            per_cond[f"{ntype}/{snr}"] = {
                "f1": round(f1, 4), "precision": round(prec, 4),
                "recall": round(rec, 4)}
        allv = [v["f1"] for v in per_cond.values()]
        per_cond["overall_mean_f1"] = round(float(np.mean(allv)), 4)
        table[modality] = per_cond
    results["f1_per_condition"] = table

    print("\n| condition | " + " | ".join(f"{m} F1" for m in table) + " |")
    print("|---|" + "---|" * len(table))
    for (ntype, snr) in conditions:
        c = f"{ntype}/{snr}"
        print(f"| {c} | " + " | ".join(
            f"{table[m][c]['f1']:.3f}" for m in table) + " |")
    print("| mean | " + " | ".join(
        f"{table[m]['overall_mean_f1']:.3f}" for m in table) + " |")

    # ---- 4. conditioned-enhancement legs --------------------------------
    if args.enhance_model_dir:
        from dvae_tpu.data.io import read_wav
        from dvae_tpu.eval.pesq_native import pesq_wb
        from dvae_tpu.eval.si_sdr import si_sdr_leroux
        from dvae_tpu.eval.stoi import stoi

        fs = 16000
        trim = int(0.05 * fs)

        def score_tree(out_dir, suffix):
            rows = []
            for est in pathlib.Path(out_dir).rglob(f"*_s_est{suffix}.wav"):
                utt = est.name[:-len(f"_s_est{suffix}.wav")]
                spk = est.parent.name
                s, _ = read_wav(proc / "Clean" / "test" / spk / f"{utt}.wav")
                e, _ = read_wav(est)
                a, b = trim, min(len(s), len(e)) - trim
                rows.append((float(si_sdr_leroux(e[a:b], s[a:b])),
                             float(stoi(s[a:b], e[a:b], fs, extended=True)),
                             float(pesq_wb(s[a:b], e[a:b], fs))))
            assert rows, f"no *_s_est{suffix}.wav under {out_dir}"
            m = np.asarray(rows).mean(axis=0)
            return {"n": len(rows), "si_sdr": round(float(m[0]), 3),
                    "estoi": round(float(m[1]), 4),
                    "pesq": round(float(m[2]), 3)}

        legs = {"oracle": None, **{m: preds_root / m for m in dirs}}
        for leg, cdir in legs.items():
            out_dir = models_root / f"av_study_enhanced{tag}" / leg
            argv = [SCRIPTS / "evaluate_ntcd_M2.py", *common,
                    "--labels", "vad_labels",
                    "--model-dir", args.enhance_model_dir,
                    "--niter", args.niter, "--snr", args.snr,
                    "--output-dir", out_dir]
            if leg == "oracle":
                argv += ["--y-source", "oracle"]
            else:
                argv += ["--y-source", "classifier",
                         "--classifier-dir", cdir]
            if args.platform:
                argv += ["--platform", args.platform]
            t0 = time.time()
            run(argv)
            # wall_s = the evaluate_ntcd_M2 subprocess only (incl. its
            # compile + corpus walk), stamped BEFORE the host-side metric
            # pass — scoring minutes must not masquerade as enhancement
            # (this repo's wall_s-semantics convention, PARITY §2b)
            wall = round(time.time() - t0, 1)
            suffix = "" if leg == "oracle" else "_y_hat_hard"
            results["enhancement"][leg] = score_tree(out_dir, suffix)
            results["enhancement"][leg]["wall_s"] = wall
        base = results["enhancement"]["oracle"]
        for leg in dirs:
            r = results["enhancement"][leg]
            r["delta_vs_oracle"] = {
                "si_sdr": round(r["si_sdr"] - base["si_sdr"], 3),
                "estoi": round(r["estoi"] - base["estoi"], 4),
                "pesq": round(r["pesq"] - base["pesq"], 3)}
        print("\n| conditioning | SI-SDR | ESTOI | nPESQ | Δ SI-SDR vs oracle |")
        print("|---|---|---|---|---|")
        for leg, r in results["enhancement"].items():
            d = r.get("delta_vs_oracle", {}).get("si_sdr")
            print(f"| {leg} | {r['si_sdr']:+.2f} | {r['estoi']:.3f} "
                  f"| {r['pesq']:.2f} | "
                  f"{'' if d is None else f'{d:+.2f} dB'} |")

    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
