#!/usr/bin/env python
"""Train the visual (lip-video) or audio-visual voice-activity classifier.

The reference consumes VIDEO-classifier VAD labels at test time
(``*_y_hat_hard.pt``, evaluate_ntcd_M2.py:85,180-189) but the classifier
itself lives in its sibling audio-visual-vad repo (reference README.md:6) —
in-repo there is only a commented ``from video_net import VideoClassifier``
(train_audio_net.py:14) and checkpoints *named* ``Video_Net_epoch_*``
(train_audio_net.py:368-371). This script closes the loop in-framework:

* ``--modality video`` (default): lip-ROI conv encoder + LSTM over the
  62.5 fps upsampled ``<utt>_upsampled.h5`` frames the
  create_video_train_files builder writes;
* ``--modality av``: the audio-visual fusion — noisy log-power spectrogram
  frames concatenated with the lip embedding, over exactly the triples the
  reference's ``AudioVisualSequenceLabeledFrames`` loader assembles
  (data_handling.py:225-330: noisy wav per condition, video h5 via the
  Clean<->matlab_raw path substitution, labels trimmed to the common
  frame count).

Checkpoints follow the reference's own naming (``Video_Net_epoch_*``;
``AV_Net_epoch_*`` for the fusion). Predictions for the enhancement CLIs
come from ``scripts/predict_vad_labels.py --modality video|av``.
"""

import argparse
import os

from _lib import add_common, make_mesh_if, maybe_force_platform, processed_dir


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__))
    ap.add_argument("--modality", default="video", choices=["video", "av"])
    ap.add_argument("--learning-rate", type=float, default=1e-4)
    ap.add_argument("--start-epoch", type=int, default=1)
    ap.add_argument("--end-epoch", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--run-name", default=None,
                    help="override the auto model dir name")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard sequence batches over all visible devices")
    ap.add_argument("--multihost", action="store_true",
                    help="join a multi-process JAX runtime before building "
                         "the mesh; implies --data-parallel")
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--num-layers", type=int, default=2)
    ap.add_argument("--emb-dim", type=int, default=128,
                    help="lip-encoder embedding width")
    ap.add_argument("--seq-batch-size", type=int, default=16)
    ap.add_argument("--train-split", default="train",
                    help="catalog split for training (the shipped subset's "
                         "noisy wavs and label h5s only cover 'test' — use "
                         "it for smoke runs)")
    ap.add_argument("--valid-split", default="validation")
    ap.add_argument("--std-norm", action="store_true",
                    help="normalize inputs with the builders' train "
                         "statistics: lip pixels with the video stats h5 "
                         "(create_video_train_files), and for --modality av "
                         "also the noisy log-power frames with the audio "
                         "stats h5 (as train_audio_net.py)")
    ap.add_argument("--video-stats-h5", default=None,
                    help="pixel statistics h5 for --std-norm (default: the "
                         "create_video_train_files output, "
                         "<processed>/ntcd_timit/matlab_raw/"
                         "ntcd_timit_upsampled_statistics.h5)")
    ap.add_argument("--stats-h5", default=None,
                    help="audio statistics h5 for --modality av --std-norm "
                         "(default: the noisy log-power stats, as "
                         "train_audio_net.py)")
    args = ap.parse_args()
    if args.labels != "vad_labels":
        # the VAD head emits one scalar per frame; a 513-dim IBM label
        # would silently flatten into garbage in the sequence batchers
        ap.error("train_video_net is VAD-only (--labels vad_labels)")
    maybe_force_platform(args)

    import jax

    from dvae_tpu.data.av_dataset import AudioVisualDataset, VideoDataset
    from dvae_tpu.data.catalog import ntcd_timit
    from dvae_tpu.models import AVVad, VideoVad
    from dvae_tpu.ops.stft import StftConfig
    from dvae_tpu.train.sequence import (
        batch_av_utterances, batch_video_utterances, fit_sequence,
        make_lstm_vad_eval, make_lstm_vad_step,
    )
    from dvae_tpu.train.steps import adam, init_train_state

    proc = processed_dir(args)
    stft_cfg = StftConfig(center=True)  # loader parity (data_handling.py:126-139)

    def dataset(split):
        if args.modality == "video":
            video_rel, _ = ntcd_timit.proc_video_audio_pair_dict(
                proc + "/", split, labels=args.labels, upsampled=True)
            pairs = []
            for v in video_rel:
                lab = os.path.join(proc,
                                   ntcd_timit.label_h5_rel(v, args.labels))
                if os.path.exists(lab):
                    pairs.append((os.path.join(proc, v), lab))
            return VideoDataset(pairs)
        noisy_label = ntcd_timit.proc_noisy_clean_pair_dict(
            proc + "/", split, args.dataset_size, args.labels, upsampled=True)
        triples = []
        for noisy_rel, label_rel in noisy_label.items():
            wav = os.path.join(proc, noisy_rel)
            lab = os.path.join(proc, label_rel)
            vid = os.path.join(proc,
                               ntcd_timit.video_h5_rel(label_rel, args.labels))
            if all(os.path.exists(p) for p in (wav, lab, vid)):
                triples.append((wav, vid, lab))
        return AudioVisualDataset(triples)

    train_ds, valid_ds = dataset(args.train_split), dataset(args.valid_split)
    if len(train_ds) == 0:
        raise SystemExit("no training utterances found; run the create_* builders")
    print(f"{len(train_ds)} train / {len(valid_ds)} validation utterances")

    norm = None
    if args.std_norm:
        import h5py

        vstats = args.video_stats_h5 or os.path.join(
            proc, "ntcd_timit", "matlab_raw",
            "ntcd_timit_upsampled_statistics.h5")
        with h5py.File(vstats, "r") as f:
            video_norm = (f["X_train_mean"][:], f["X_train_std"][:])
        print(f"video std-norm from {vstats}")
        if args.modality == "video":
            norm = video_norm
        else:
            astats = args.stats_h5 or os.path.join(
                proc, "ntcd_timit", "Noisy",
                "ntcd_timit_log_power_spec_upsampled_statistics.h5")
            with h5py.File(astats, "r") as f:
                audio_norm = (f["X_train_mean"][:], f["X_train_std"][:])
            print(f"audio std-norm from {astats}")
            norm = (audio_norm, video_norm)

    if args.modality == "video":
        model = VideoVad(hidden=args.hidden, num_layers=args.num_layers,
                         emb_dim=args.emb_dim)
        batcher = lambda ds, idx: batch_video_utterances(ds, idx)
        prefix = "Video_Net"  # the reference's own naming, train_audio_net.py:368
    else:
        model = AVVad(x_dim=513, hidden=args.hidden,
                      num_layers=args.num_layers, emb_dim=args.emb_dim)
        batcher = lambda ds, idx: batch_av_utterances(ds, idx, stft_cfg)
        prefix = "AV_Net"

    xb, _, _ = batcher(train_ds, range(min(2, len(train_ds))))
    params = model.init({"params": jax.random.PRNGKey(args.seed)}, xb)
    tx = adam(args.learning_rate)
    state = init_train_state(model, params, tx)
    step = make_lstm_vad_step(model, tx, norm=norm)
    evaluate = make_lstm_vad_eval(model, norm=norm)

    model_dir = os.path.join(
        args.models_root,
        args.run_name or (f"ntcd_{args.modality}_vad_{args.hidden}x{args.num_layers}"
                          + ("_norm" if args.std_norm else "")))
    fit_sequence(
        state, step, evaluate, train_ds, valid_ds, batcher, model_dir,
        prefix=prefix, seed=args.seed,
        start_epoch=args.start_epoch, end_epoch=args.end_epoch,
        batch_size=args.seq_batch_size, mesh=make_mesh_if(args))


if __name__ == "__main__":
    main()
