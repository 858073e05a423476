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
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--num-layers", type=int, default=2)
    ap.add_argument("--source", default="noisy", choices=["noisy", "clean"],
                    help="predict from the noisy mixtures (per-condition "
                         "output tree) or from the clean wavs (one file per "
                         "utterance, the reference's video-classifier layout)")
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
                    help="statistics h5 for --std-norm (default: the "
                         "create_audio_train_set builder's noisy stats file, "
                         "as in train_audio_net.py)")
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
    maybe_force_platform(args)

    import jax
    import numpy as np

    from dvae_tpu.data.catalog import ntcd_timit
    from dvae_tpu.data.datasets import UtteranceDataset
    from dvae_tpu.enhance.evaluate import clean_audio_rel, shard_slice
    from dvae_tpu.models import LSTMVad
    from dvae_tpu.models.losses import f1_loss
    from dvae_tpu.ops.stft import StftConfig
    from dvae_tpu.train import checkpoint as ckpt
    from dvae_tpu.train.sequence import batch_utterances, make_lstm_vad_predict

    proc = processed_dir(args)
    stft_cfg = StftConfig(center=True)  # loader parity with the trainer

    pairs = ntcd_timit.proc_noisy_clean_pair_dict(
        proc + "/", args.dataset_type, args.dataset_size, args.labels,
        upsampled=True)
    items = list(pairs.items())
    if args.source == "noisy":
        if args.snr != "all":
            items = [it for it in items
                     if it[0].split("/")[-4] == str(args.snr)]
        # (input_wav_rel, label_rel, output_rel_stem)
        todo = [(n, c, os.path.splitext(n)[0]) for n, c in items]
    else:
        # one prediction per utterance from the clean wav; several noisy
        # conditions map to the same clean utterance — dedupe on it
        seen = {}
        for _, clean_rel in items:
            wav_rel = clean_audio_rel(clean_rel, args.labels)
            seen.setdefault(wav_rel, (wav_rel, clean_rel,
                                      os.path.splitext(wav_rel)[0]))
        todo = sorted(seen.values())
    # --shard K/N: same contiguous-chunk semantics as the eval sweeps,
    # applied before the skip filter so membership is stable across restarts
    todo = shard_slice(todo, shard_of(args))

    norm = None
    if args.std_norm:
        import h5py

        stats = args.stats_h5 or os.path.join(
            proc, "ntcd_timit", "Noisy",
            "ntcd_timit_log_power_spec_upsampled_statistics.h5")
        with h5py.File(stats, "r") as f:
            norm = (f["X_train_mean"][:], f["X_train_std"][:])
        print(f"std-norm from {stats}")

    model = LSTMVad(x_dim=513, hidden=args.hidden, num_layers=args.num_layers)
    path = args.checkpoint or ckpt.best_checkpoint(args.model_dir, prefix="VAD")
    dummy = np.zeros((1, 4, 513), np.float32)
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

    if not args.overwrite:
        todo = [t for t in todo
                if not all(os.path.exists(p) for p in out_paths(t[2]))]
    # length-bucketed batches (same lever as the enhancement sweep): wav
    # size orders by sample count for PCM files, no decode needed
    todo.sort(key=lambda t: (os.path.getsize(os.path.join(proc, t[0])), t[0]))

    ds = UtteranceDataset(
        [(os.path.join(proc, w), os.path.join(proc, l)) for w, l, _ in todo])
    n_done = 0
    agree = []  # (y_hat_hard, y_oracle) per frame, for the summary F1
    for s in range(0, len(todo), args.seq_batch_size):
        idx = range(s, min(s + args.seq_batch_size, len(todo)))
        xb, yb, mb = batch_utterances(ds, idx, stft_cfg)
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
