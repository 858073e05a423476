#!/usr/bin/env python
"""Predict per-frame VAD labels with a trained audio LSTM classifier.

The classifier outputs the reference consumes (``*_y_hat_hard.pt`` at its
evaluate_ntcd_M2.py:85,180-189 and run_metrics_classif.py:129-136) were
produced OUTSIDE its tree, by the sibling audio-visual-vad repo
(reference README.md:6) — a reference user cannot regenerate them from the
repo alone. This script closes that loop in-framework: it runs a
``train_audio_net.py`` checkpoint over the test utterances and writes
``*_y_hat_hard.npy`` (thresholded decisions) plus ``*_y_hat_soft.npy``
(the sigmoid posterior) in the layout every consumer already reads:

* ``evaluate_ntcd_M2*.py --y-source classifier --classifier-dir <out>[/cond]``
* ``run_metrics.py --classifier-dir <out>`` (in-sweep F1 columns)
* ``run_metrics_classif.py --classifier-dir <out>`` (CI tables, figures,
  ``--label-suffix _y_hat_soft --binarize T`` for the soft dumps)

``--source noisy`` (default) predicts from each noisy mixture and mirrors
the noisy tree (``<out>/ntcd_timit/Noisy/<type>/<snr>/test/<spk>/...``) so
different conditions never collide; point consumers at a single condition
subtree (or at ``<out>`` itself — the recursive lookup picks
deterministically). ``--source clean`` predicts once per utterance from the
clean wav, matching the one-file-per-utterance layout of the reference's
video classifier exactly.

``--modality`` selects the classifier family: ``audio`` (default, a
train_audio_net.py checkpoint over the wavs), ``video`` (a
train_video_net.py checkpoint over the lip h5s — THE reference setup: its
consumed labels came from a video classifier, README.md:6; one prediction
per utterance, clean layout), or ``av`` (a train_video_net.py
--modality av checkpoint over noisy-audio+video pairs; per-condition noisy
layout).
"""

import argparse
import os

from _lib import add_common, add_shard, maybe_force_platform, processed_dir, shard_of


def main():
    ap = add_common(argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter))
    ap.add_argument("--model-dir", default=None,
                    help="train_audio_net.py output dir (best checkpoint "
                         "auto-selected)")
    ap.add_argument("--checkpoint", default=None,
                    help="explicit checkpoint path (overrides --model-dir)")
    ap.add_argument("--modality", default="audio",
                    choices=["audio", "video", "av"],
                    help="classifier family: audio LSTM (train_audio_net), "
                         "lip-video (train_video_net), or the AV fusion "
                         "(train_video_net --modality av)")
    ap.add_argument("--hidden", type=int, default=None,
                    help="LSTM width (default: 1024 for audio — the "
                         "reference's, train_audio_net.py:69 — 512 for "
                         "video/av, matching the trainers)")
    ap.add_argument("--num-layers", type=int, default=2)
    ap.add_argument("--emb-dim", type=int, default=128,
                    help="lip-encoder embedding width (video/av)")
    ap.add_argument("--source", default=None, choices=["noisy", "clean"],
                    help="audio modality only: predict from the noisy "
                         "mixtures (default; per-condition output tree) or "
                         "from the clean wavs (one file per utterance, the "
                         "reference's video-classifier layout). video is "
                         "always per-utterance; av always per-condition")
    ap.add_argument("--dataset-type", default="test")
    ap.add_argument("--snr", default="10",
                    help="only this SNR condition for --source noisy "
                         "('all' = every condition; the subset ships -5)")
    ap.add_argument("--seq-batch-size", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="hard-decision threshold on the sigmoid posterior "
                         "(the trainer's F1 operating point, "
                         "train/sequence.py)")
    ap.add_argument("--std-norm", action="store_true",
                    help="the model was trained with --std-norm: normalize "
                         "inputs with the noisy log-power train statistics")
    ap.add_argument("--stats-h5", default=None,
                    help="audio statistics h5 for --std-norm (default: the "
                         "create_audio_train_set builder's noisy stats file, "
                         "as in train_audio_net.py)")
    ap.add_argument("--video-stats-h5", default=None,
                    help="pixel statistics h5 for --std-norm with "
                         "--modality video/av (default: the "
                         "create_video_train_files output under matlab_raw/)")
    ap.add_argument("--output-dir", default=None,
                    help="default: <models-root>/predictions/<model>/<ckpt>")
    ap.add_argument("--overwrite", action="store_true",
                    help="re-predict even when both output files exist "
                         "(default: resume-by-skip, like the eval sweeps)")
    add_shard(ap)
    args = ap.parse_args()
    if args.labels != "vad_labels":
        # the LSTM head emits one scalar per frame; IBM (513-dim) labels
        # have no audio-net producer in the reference either
        ap.error("predict_vad_labels is VAD-only (--labels vad_labels)")
    if not (args.checkpoint or args.model_dir):
        ap.error("need --checkpoint or --model-dir")
    if args.modality == "audio":
        args.source = args.source or "noisy"
    elif args.source is not None:
        ap.error("--source applies to --modality audio only (video is "
                 "per-utterance, av per-condition by construction)")
    if args.hidden is None:
        args.hidden = 1024 if args.modality == "audio" else 512
    maybe_force_platform(args)

    import jax
    import numpy as np

    from dvae_tpu.data.av_dataset import AudioVisualDataset, VideoDataset
    from dvae_tpu.data.catalog import ntcd_timit
    from dvae_tpu.data.datasets import UtteranceDataset
    from dvae_tpu.enhance.evaluate import clean_audio_rel, shard_slice
    from dvae_tpu.models import AVVad, LSTMVad, VideoVad
    from dvae_tpu.models.losses import f1_loss
    from dvae_tpu.ops.stft import StftConfig
    from dvae_tpu.train import checkpoint as ckpt
    from dvae_tpu.train.sequence import (batch_av_utterances,
                                         batch_utterances,
                                         batch_video_utterances,
                                         make_lstm_vad_predict)

    proc = processed_dir(args)
    stft_cfg = StftConfig(center=True)  # loader parity with the trainer

    def video_rel_of(label_rel):
        """Label h5 -> lip-video h5 (one home: catalog.video_h5_rel)."""
        return ntcd_timit.video_h5_rel(label_rel, args.labels)

    pairs = ntcd_timit.proc_noisy_clean_pair_dict(
        proc + "/", args.dataset_type, args.dataset_size, args.labels,
        upsampled=True)
    items = list(pairs.items())
    per_condition = (args.modality == "av" or args.source == "noisy")
    if per_condition:
        if args.snr != "all":
            items = [it for it in items
                     if it[0].split("/")[-4] == str(args.snr)]
        # (input_rel, label_rel, output_rel_stem)
        todo = [(n, c, os.path.splitext(n)[0]) for n, c in items]
    else:
        # one prediction per utterance; several noisy conditions map to the
        # same clean utterance — dedupe on it. Input is the clean wav
        # (--source clean) or the lip-video h5 (--modality video); the
        # output stem is the clean-wav layout either way — the reference's
        # one-file-per-utterance video-classifier layout
        seen = {}
        for _, clean_rel in items:
            wav_rel = clean_audio_rel(clean_rel, args.labels)
            inp = (video_rel_of(clean_rel) if args.modality == "video"
                   else wav_rel)
            seen.setdefault(wav_rel, (inp, clean_rel,
                                      os.path.splitext(wav_rel)[0]))
        todo = sorted(seen.values())
    # --shard K/N: same contiguous-chunk semantics as the eval sweeps,
    # applied before the skip filter so membership is stable across restarts
    todo = shard_slice(todo, shard_of(args))

    norm = None
    if args.std_norm:
        import h5py

        def load_stats(path):
            with h5py.File(path, "r") as f:
                return (f["X_train_mean"][:], f["X_train_std"][:])

        audio_norm = video_norm = None
        if args.modality in ("audio", "av"):
            stats = args.stats_h5 or os.path.join(
                proc, "ntcd_timit", "Noisy",
                "ntcd_timit_log_power_spec_upsampled_statistics.h5")
            audio_norm = load_stats(stats)
            print(f"audio std-norm from {stats}")
        if args.modality in ("video", "av"):
            vstats = args.video_stats_h5 or os.path.join(
                proc, "ntcd_timit", "matlab_raw",
                "ntcd_timit_upsampled_statistics.h5")
            video_norm = load_stats(vstats)
            print(f"video std-norm from {vstats}")
        norm = {"audio": audio_norm, "video": video_norm,
                "av": (audio_norm, video_norm)}[args.modality]

    if args.modality == "audio":
        model = LSTMVad(x_dim=513, hidden=args.hidden,
                        num_layers=args.num_layers)
        prefix, dummy = "VAD", np.zeros((1, 4, 513), np.float32)
    elif args.modality == "video":
        model = VideoVad(hidden=args.hidden, num_layers=args.num_layers,
                         emb_dim=args.emb_dim)
        prefix, dummy = "Video_Net", np.zeros((1, 4, 67, 67), np.float32)
    else:
        model = AVVad(x_dim=513, hidden=args.hidden,
                      num_layers=args.num_layers, emb_dim=args.emb_dim)
        prefix, dummy = "AV_Net", (np.zeros((1, 4, 513), np.float32),
                                   np.zeros((1, 4, 67, 67), np.float32))
    path = args.checkpoint or ckpt.best_checkpoint(args.model_dir, prefix=prefix)
    params = ckpt.load_checkpoint(
        str(path), model.init({"params": jax.random.PRNGKey(0)}, dummy))
    print(f"loaded {path}")
    predict = make_lstm_vad_predict(model, norm=norm)

    model_name = os.path.basename(os.path.normpath(
        args.model_dir or os.path.dirname(str(path))))
    out_root = args.output_dir or os.path.join(
        args.models_root, "predictions", model_name,
        os.path.splitext(os.path.basename(str(path)))[0])

    def out_paths(stem):
        base = os.path.join(out_root, stem)
        return base + "_y_hat_hard.npy", base + "_y_hat_soft.npy"

    def inputs_of(t):
        """Every file a todo item must have on disk: its primary input
        (noisy/clean wav or lip h5 — the catalogs synthesize paths from
        the full noise-by-SNR grid without checking disk,
        catalog/ntcd_timit.py proc_noisy_clean_pair_dict), plus the lip
        h5 for the AV fusion."""
        paths = [t[0]]
        if args.modality == "av":
            paths.append(video_rel_of(t[1]))
        return paths

    have = [t for t in todo
            if all(os.path.exists(os.path.join(proc, p)) for p in inputs_of(t))]
    if len(have) < len(todo):
        # skip loudly (mirrors the eval sweeps' skip-with-count behavior)
        # instead of aborting a long, possibly sharded run at the
        # getsize() sort below with FileNotFoundError
        print(f"skipping {len(todo) - len(have)} utterances with missing "
              "input files")
    todo = have

    if not args.overwrite:
        todo = [t for t in todo
                if not all(os.path.exists(p) for p in out_paths(t[2]))]
    # length-bucketed batches (same lever as the enhancement sweep): input
    # file size orders by duration for PCM wavs and uncompressed video h5s
    # alike, no decode needed
    todo.sort(key=lambda t: (os.path.getsize(os.path.join(proc, t[0])), t[0]))

    if args.modality == "audio":
        ds = UtteranceDataset(
            [(os.path.join(proc, w), os.path.join(proc, l))
             for w, l, _ in todo])
        batcher = lambda idx: batch_utterances(ds, idx, stft_cfg)
    elif args.modality == "video":
        ds = VideoDataset(
            [(os.path.join(proc, v), os.path.join(proc, l))
             for v, l, _ in todo])
        batcher = lambda idx: batch_video_utterances(ds, idx)
    else:
        ds = AudioVisualDataset(
            [(os.path.join(proc, w), os.path.join(proc, video_rel_of(l)),
              os.path.join(proc, l)) for w, l, _ in todo])
        batcher = lambda idx: batch_av_utterances(ds, idx, stft_cfg)
    n_done = 0
    agree = []  # (y_hat_hard, y_oracle) per frame, for the summary F1
    for s in range(0, len(todo), args.seq_batch_size):
        idx = range(s, min(s + args.seq_batch_size, len(todo)))
        xb, yb, mb = batcher(idx)
        probs = np.asarray(jax.device_get(predict(params, xb)))
        for j, i in enumerate(idx):
            n = int(np.sum(np.asarray(mb)[j]))
            soft = probs[j, :n].astype(np.float32)
            hard = (soft > args.threshold).astype(np.float32)
            hard_p, soft_p = out_paths(todo[i][2])
            os.makedirs(os.path.dirname(hard_p), exist_ok=True)
            np.save(soft_p, soft)
            np.save(hard_p, hard)
            agree.append((hard, np.asarray(yb)[j, :n]))
            n_done += 1
        print(f"predicted {n_done}/{len(todo)}")

    if agree:
        import jax.numpy as jnp

        y_hat = jnp.concatenate([jnp.asarray(h) for h, _ in agree])
        y = jnp.concatenate([jnp.asarray(o) for _, o in agree])
        acc, prec, rec, f1 = f1_loss(y_hat, y)
        print(f"vs oracle: accuracy={float(acc):.4f} precision={float(prec):.4f} "
              f"recall={float(rec):.4f} f1={float(f1):.4f}")
    print(f"done: {n_done} utterances -> {out_root}")


if __name__ == "__main__":
    main()
