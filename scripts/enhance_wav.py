#!/usr/bin/env python
"""Enhance arbitrary wav files with a trained model — the serving CLI.

The reference can only enhance the NTCD-TIMIT corpus layout (its
evaluate_ntcd_* scripts walk `proc_noisy_clean_pair_dict`,
evaluate_ntcd_M1.py:100-113); there is no way to point it at a plain
recording. This CLI runs the same batched MCEM engine over any list of wav
files or directories: no corpus, no oracle labels, no fixed tree — the
deployment surface.

    python scripts/enhance_wav.py noisy1.wav recordings/ \\
        --model-dir models/ntcd_M1_... --output-dir enhanced/

Conditional models work without oracle labels: `--y-source self-soft` runs
the model's OWN x->y classifier on the NOISY mixture spectrogram (the
corpus CLI's self-soft uses the clean wav, reference
evaluate_ntcd_M2_info_vad.py:174-176 — a serving run has no clean side);
`--y-source npy` reads a `<stem>_y.npy` sibling next to each input (e.g.
from predict_vad_labels.py or any external VAD); `ones`/`zeros` are the
constant-label ablations. Outputs are `<stem>_s_est.wav` / `<stem>_n_est.wav`
(the Wiener-complementary speech/noise split: s_est + n_est reconstructs the
input). Length-agnostic — the engine is verified to 120 s utterances."""

import argparse
import os
import pathlib

from _lib import (add_mcem_budgets, add_model_family, load_family_model,
                  make_mesh_if, maybe_force_platform, mcem_config_of)


def gather_inputs(paths):
    out = []
    for p in paths:
        p = pathlib.Path(p)
        if p.is_dir():
            out.extend(sorted(q for q in p.rglob("*.wav")
                              if not q.name.endswith(("_s_est.wav",
                                                      "_n_est.wav"))))
        elif p.suffix.lower() == ".wav":
            out.append(p)
        else:
            raise SystemExit(f"{p}: not a wav file or directory")
    if not out:
        raise SystemExit("no input wav files found")
    return out


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("inputs", nargs="+", help="wav files and/or directories "
                    "(searched recursively for *.wav)")
    add_model_family(ap)
    add_mcem_budgets(ap)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard each batch over all visible devices")
    ap.add_argument("--y-source", default="self-soft",
                    choices=["self-soft", "npy", "ones", "zeros"],
                    help="labels for conditional classes (ignored for m1): "
                         "self-soft = the model's own classifier on the "
                         "mixture (v3/v4/v5 only); npy = <stem>_y.npy next "
                         "to each input")
    ap.add_argument("--std-norm", action="store_true",
                    help="the model was trained with --std-norm; requires "
                         "--norm-h5 (no corpus tree to default from here)")
    ap.add_argument("--norm-h5", default=None,
                    help="h5 with X_train_mean/X_train_std for --std-norm")
    ap.add_argument("--output-dir", default="enhanced",
                    help="where <stem>_s_est.wav/_n_est.wav land (flat; "
                         "name collisions across input dirs get _2, _3, ...)")
    ap.add_argument("--resample", action="store_true",
                    help="polyphase-resample inputs whose rate differs from "
                         "the model's 16 kHz (outputs stay at 16 kHz); "
                         "without it a mismatched file is an error")
    ap.add_argument("--chunk-seconds", type=float, default=None,
                    help="bounded-memory mode for very long recordings: "
                         "split each file into chunks of this many seconds "
                         "(enhanced together as one device batch) and "
                         "cross-fade the overlaps — device memory stops "
                         "growing with file length (enhance/longform.py)")
    ap.add_argument("--chunk-overlap", type=float, default=1.0,
                    help="cross-fade overlap in seconds for --chunk-seconds")
    ap.add_argument("--chunk-concurrency", type=int, default=4,
                    help="chunks per device dispatch — THE memory bound: "
                         "resident state is chunk-concurrency x "
                         "chunk-seconds of audio, whatever the file length")
    ap.add_argument("--overwrite", action="store_true",
                    help="re-enhance files whose outputs already exist "
                         "(default: resume-by-skip, like the corpus sweeps)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform before first use (e.g. cpu)")
    ap.add_argument("--no-jit-cache", action="store_true")
    args = ap.parse_args()
    if not (args.checkpoint or args.model_dir):
        ap.error("need --checkpoint or --model-dir")
    if args.std_norm and not args.norm_h5:
        ap.error("--std-norm requires --norm-h5 (this CLI has no corpus "
                 "tree to locate the training statistics in)")
    conditional = args.model_class != "m1"
    if conditional and args.y_source == "self-soft" and args.model_class in (
            "m2", "m2v2"):
        ap.error(f"{args.model_class} has no classifier; use --y-source "
                 "npy/ones/zeros")
    maybe_force_platform(args)

    import jax
    import numpy as np

    from dvae_tpu.data.io import read_wav, resample, write_wav
    from dvae_tpu.enhance.labeling import (classify_method_of, constant_labels,
                                           self_soft_labels)
    from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
    from dvae_tpu.ops.stft import StftConfig, n_stft_frames_clamped

    from _lib import warn_peem_family

    warn_peem_family(args, args.model_class, args.y_dim)
    model, params, path = load_family_model(args)
    print(f"loaded {path}")

    norm = None
    if args.std_norm:
        import h5py

        with h5py.File(args.norm_h5, "r") as f:
            norm = (f["X_train_mean"][:], f["X_train_std"][:])

    stft_cfg = StftConfig()
    classify_method = classify_method_of(args.model_class)

    def load_input(p):
        x, fs = read_wav(p)
        if x.ndim > 1:
            x = x.mean(axis=-1)  # downmix multi-channel
        if fs != stft_cfg.fs and not args.resample:
            raise SystemExit(f"{p}: {fs} Hz != model rate {stft_cfg.fs} Hz "
                             "(pass --resample to convert)")
        return resample(x, fs, stft_cfg.fs).astype(np.float32)

    def labels_for(p, x):
        """Per-file labels for the constant/npy sources (self-soft is
        answered per BATCH by labeling.self_soft_labels — one classifier
        call per chunk instead of one per utterance)."""
        n = n_stft_frames_clamped(len(x), stft_cfg)  # already floored at 1
        if args.y_source in ("ones", "zeros"):
            return constant_labels(n, args.y_dim, args.y_source)
        side = p.with_name(p.stem + "_y.npy")
        if not side.exists():
            raise SystemExit(f"--y-source npy: {side} not found")
        y = np.load(side).astype(np.float32).reshape(-1, args.y_dim)
        if len(y) < n:
            raise SystemExit(f"{side}: {len(y)} labels < {n} frames")
        return y[:n]

    y_mode = {"m1": "none", "m2": "enc_dec"}.get(args.model_class, "dec_only")
    enh = Enhancer(model, params, EnhancerConfig(
        mcem=mcem_config_of(args),
        y_mode=y_mode, norm=norm, engine=args.engine),
        mesh=make_mesh_if(args))

    files = gather_inputs(args.inputs)
    out_dir = pathlib.Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    # flat output names; disambiguate duplicate stems from different dirs
    names, used = [], set()
    for p in files:
        stem, k = p.stem, 2
        while stem in used:
            stem, k = f"{p.stem}_{k}", k + 1
        used.add(stem)
        names.append(stem)

    # fail fast BEFORE any decode or device work: a rate mismatch or a
    # missing label sibling in the LAST size-ordered batch must not abort
    # a long run halfway through (header-only rate probe, no data read)
    from dvae_tpu.data.io import wav_sample_rate

    for p in files:
        fs_in = wav_sample_rate(p)
        if fs_in != stft_cfg.fs and not args.resample:
            raise SystemExit(f"{p}: {fs_in} Hz != model rate {stft_cfg.fs} Hz "
                             "(pass --resample to convert)")
        if conditional and args.y_source == "npy" and \
                not p.with_name(p.stem + "_y.npy").exists():
            raise SystemExit(f"--y-source npy: {p.with_name(p.stem + '_y.npy')}"
                             " not found")

    # resume-by-skip like the corpus sweeps (stems stay deterministic for
    # an unchanged input list — collision suffixes are assigned in input
    # order before filtering)
    todo = [i for i in range(len(files))
            if args.overwrite
            or not ((out_dir / f"{names[i]}_s_est.wav").exists()
                    and (out_dir / f"{names[i]}_n_est.wav").exists())]

    # length-bucketed batches (same lever as the corpus sweep): sort by
    # file size, batch, restore nothing — outputs are per-file
    order = sorted(todo,
                   key=lambda i: (os.path.getsize(files[i]), str(files[i])))
    chunks = [order[s:s + args.batch_size]
              for s in range(0, len(order), args.batch_size)]

    n_done = 0
    if args.chunk_seconds:
        # bounded-memory mode: one file at a time, its chunks ARE the
        # device batch (sub-dispatched in max_device_batch groups)
        from dvae_tpu.enhance.longform import enhance_chunked

        for j, i in enumerate(order):
            x = load_input(files[i])
            y_full, labeler = None, None
            if conditional:
                if args.y_source == "self-soft":
                    labeler = lambda ws: self_soft_labels(
                        model, params, ws, stft_cfg, args.y_dim,
                        classify_method, norm=norm)
                else:
                    y_full = labels_for(files[i], x)
            s_hat, n_hat = enhance_chunked(
                enh, x, y=y_full, labeler=labeler,
                chunk_seconds=args.chunk_seconds,
                overlap_seconds=args.chunk_overlap,
                max_concurrent_chunks=args.chunk_concurrency,
                key=jax.random.fold_in(jax.random.PRNGKey(args.seed), j))
            write_wav(out_dir / f"{names[i]}_n_est.wav", n_hat, stft_cfg.fs)
            write_wav(out_dir / f"{names[i]}_s_est.wav", s_hat, stft_cfg.fs)
            n_done += 1
            print(f"enhanced {n_done}/{len(order)}")
        chunks = []

    def batches():
        for chunk in chunks:
            wavs = [load_input(files[i]) for i in chunk]
            ys = None
            if conditional:
                if args.y_source == "self-soft":
                    ys = self_soft_labels(model, params, wavs, stft_cfg,
                                          args.y_dim, classify_method,
                                          norm=norm)
                else:
                    ys = [labels_for(files[i], w)
                          for i, w in zip(chunk, wavs)]
            yield wavs, ys, None

    for chunk, out in zip(chunks, enh.enhance_stream(
            batches(), key=jax.random.PRNGKey(args.seed))):
        for i, (s_hat, n_hat) in zip(chunk, out):
            write_wav(out_dir / f"{names[i]}_n_est.wav", n_hat, stft_cfg.fs)
            write_wav(out_dir / f"{names[i]}_s_est.wav", s_hat, stft_cfg.fs)
            n_done += 1
        print(f"enhanced {n_done}/{len(order)}")
    if len(order) < len(files):
        print(f"skipped {len(files) - len(order)} already-enhanced files "
              "(--overwrite redoes them)")
    print(f"done: {n_done} files -> {out_dir}")


if __name__ == "__main__":
    main()
