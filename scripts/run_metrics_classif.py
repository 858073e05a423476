#!/usr/bin/env python
"""VAD/IBM classifier metrics: accuracy / precision / recall / F1 of stored
classifier outputs against the oracle labels, with CI tables per condition.

Mirrors /root/reference/scripts/run_metrics_classif.py:129-136 (classifier
outputs are *_y_hat_hard.pt tensors from the sibling audio-visual-vad repo,
or .npy arrays)."""

import argparse
import os

from _lib import add_common, maybe_force_platform, processed_dir, y_dim_for


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__))
    ap.add_argument("--classifier-dir", required=True,
                    help="dir with <split>/<spk>/<utt>_y_hat_hard.pt outputs")
    ap.add_argument("--label-suffix", default="_y_hat_hard",
                    help="classifier-output suffix to score; e.g. "
                         "_y_hat_soft or _oracle_y to score the label dumps "
                         "written by evaluate_ntcd_M2_info_vad.py "
                         "--save-labels")
    ap.add_argument("--binarize", type=float, default=None, metavar="T",
                    help="threshold soft labels at T before scoring (e.g. "
                         "0.5 for _y_hat_soft dumps); default scores them "
                         "as-is (soft counts)")
    ap.add_argument("--stats-dir", default=None,
                    help="where to write stats.json (default: "
                         "--classifier-dir; useful when scoring artifacts "
                         "in a read-only tree)")
    ap.add_argument("--confidence", type=float, default=0.95)
    ap.add_argument("--with-figures", action="store_true",
                    help="per-utterance mixture/clean/mask figure with the "
                         "classifier metrics in the title, saved next to the "
                         "classifier output as *_hard_mask.png (reference "
                         "run_metrics_classif.py:204-232)")
    ap.add_argument("--snr", default="-5",
                    help="SNR folder of the mixture drawn in figures")
    ap.add_argument("--noise-type", default="Babble",
                    help="noise folder of the mixture drawn in figures")
    ap.add_argument("--with-videos", action="store_true",
                    help="per-utterance lip-video VAD demos: the upsampled "
                         "67x67 frames with a white bottom-right square on "
                         "active frames, for the oracle labels "
                         "(*_oracle_audio.mp4), the scored classifier "
                         "decisions (*_pred_audio.mp4) and — when a "
                         "*_y_hat_soft sibling exists — the soft posterior "
                         "(*_soft_audio.mp4, intensity-scaled). The working "
                         "version of the reference's commented/unrunnable "
                         "experiment (run_metrics_classif.py:238-294) incl. "
                         "its y_hat_soft TODO (:296); audio is muxed in when "
                         "an ffmpeg binary is available, else the videos are "
                         "silent. VAD labels only (needs a scalar per-frame "
                         "label)")
    args = ap.parse_args()
    maybe_force_platform(args)

    import glob

    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.enhance.evaluate import load_classifier_labels, load_oracle_labels
    from dvae_tpu.eval.stats import compute_stats
    from dvae_tpu.models.losses import f1_loss

    proc = processed_dir(args)
    suffix = f"_{args.labels}_upsampled.h5"
    label_files = sorted(
        glob.glob(os.path.join(proc, "ntcd_timit/Clean/test", f"**/*{suffix}"),
                  recursive=True))
    if not label_files:
        raise SystemExit(f"no oracle label h5s under {proc}")

    # one walk over the classifier tree, indexed by (speaker, filename) —
    # not a recursive glob per utterance (O(N x tree) on the full corpus).
    # Sorted walk + .pt-over-.npy preference keeps the pick deterministic
    # across filesystems (cf. evaluate.find_classifier_labels).
    cls_index: dict[tuple, list] = {}
    for dirpath, dirnames, filenames in os.walk(args.classifier_dir):
        dirnames.sort()
        spk_dir = os.path.basename(dirpath)
        for fn in sorted(filenames):
            if args.label_suffix + "." in fn:
                cls_index.setdefault((spk_dir, fn.rsplit(".", 1)[0]), []).append(
                    os.path.join(dirpath, fn))

    rows, speakers = [], []
    missing = no_video = 0
    for lab_path in label_files:
        rel = os.path.relpath(lab_path, proc)
        spk = rel.split("/")[-2]
        utt = os.path.basename(rel).replace(suffix, "")
        cand = sorted(cls_index.get((spk, utt + args.label_suffix), []),
                      key=lambda p: (not p.endswith(".pt"), p))
        if not cand:
            missing += 1
            continue
        y = load_oracle_labels(lab_path)
        # the y_dim hint resolves 2-D orientation exactly — without it an
        # IBM-style (frames, 513) file with < 513 frames would be transposed
        y_hat = load_classifier_labels(cand[0], y_dim_for(args.labels))
        if args.binarize is not None:
            y_hat = (y_hat > args.binarize).astype(np.float32)
        n = min(len(y), len(y_hat))
        # arguments in f1_loss's declared (y_hat, y) order — the reference
        # passes them swapped (run_metrics_classif.py:136), so its printed
        # precision/recall are exchanged; see MIGRATING.md
        acc, prec, rec, f1 = f1_loss(jnp.asarray(y_hat[:n].ravel()),
                                     jnp.asarray(y[:n].ravel()))
        rows.append([float(acc), float(prec), float(rec), float(f1)])
        speakers.append(spk)

        if args.with_figures:
            # mixture / clean+oracle-mask / classifier-mask grid, metrics in
            # the title (reference run_metrics_classif.py:204-232; the
            # reference's y_hat_soft panel is omitted — our classifier
            # artifacts only ship the hard decisions)
            import matplotlib

            matplotlib.use("pdf")
            import matplotlib.pyplot as plt

            from dvae_tpu.data.io import read_wav
            from dvae_tpu.ops.stft import StftConfig, stft_to_host
            from dvae_tpu.viz import display_multiple_signals

            clean_wav = os.path.join(os.path.dirname(lab_path), utt + ".wav")
            noisy_wav = os.path.join(
                proc, "ntcd_timit/Noisy", args.noise_type, str(args.snr),
                "test", spk, utt + ".wav")
            if os.path.exists(clean_wav) and os.path.exists(noisy_wav):
                s_t, fs = read_wav(clean_wav)
                x_t, _ = read_wav(noisy_wav)
                norm = np.max(np.abs(x_t)) or 1.0
                s_t, x_t = s_t / norm, x_t / norm
                cfg_s = StftConfig()
                sig_items = [
                    (x_t, stft_to_host(x_t, cfg_s), None),
                    (s_t, stft_to_host(s_t, cfg_s), y),
                    (None, None, y_hat),
                ]
                # the reference also panels the soft posterior
                # (run_metrics_classif.py:204-216) — included when the
                # classifier shipped *_y_hat_soft artifacts
                soft_cand = [] if args.label_suffix != "_y_hat_hard" else glob.glob(
                    os.path.splitext(cand[0])[0].replace(
                        "_y_hat_hard", "_y_hat_soft") + ".*")
                if soft_cand:
                    sig_items.append(
                        (None, None, load_classifier_labels(soft_cand[0])))
                fig = display_multiple_signals(sig_items, fs=fs)
                fig.suptitle(
                    f"Input SNR = {args.snr} dB \n"
                    f"Noise type = {args.noise_type}, \n"
                    f"Accuracy = {float(acc):.3f},  "
                    f"Precision = {float(prec):.3f},  "
                    f"Recall = {float(rec):.3f},  "
                    f"F1-score = {float(f1):.3f}\n", fontsize=40)
                fig.savefig(os.path.splitext(cand[0])[0] + "_hard_mask.png",
                            dpi=80)
                plt.close(fig)

        if args.with_videos:
            # lip-video VAD demos (the reference's commented experiment;
            # see the flag's help text). The upsampled frames live beside
            # the labels' tree under matlab_raw/<split>/<speaker>/.
            import h5py

            from dvae_tpu.viz import write_vad_demo_video

            if y.shape[-1] != 1:
                no_video += 1
            else:
                video_h5 = os.path.join(
                    proc, "ntcd_timit/matlab_raw/test", spk,
                    utt + "_upsampled.h5")
                clean_wav = os.path.join(os.path.dirname(lab_path),
                                         utt + ".wav")
                audio = clean_wav if os.path.exists(clean_wav) else None
                if not os.path.exists(video_h5):
                    no_video += 1
                else:
                    with h5py.File(video_h5, "r") as f:
                        frames = f["X"][:]
                    stem = os.path.splitext(cand[0])[0]
                    if stem.endswith(args.label_suffix):
                        stem = stem[: -len(args.label_suffix)]
                    write_vad_demo_video(frames, y.ravel(),
                                         stem + "_oracle_audio.mp4",
                                         audio_wav=audio)
                    write_vad_demo_video(frames, y_hat.ravel(),
                                         stem + "_pred_audio.mp4",
                                         audio_wav=audio)
                    # the reference's "#TODO: make video with y_hat_soft"
                    soft = [] if args.label_suffix != "_y_hat_hard" else \
                        glob.glob(os.path.splitext(cand[0])[0].replace(
                            "_y_hat_hard", "_y_hat_soft") + ".*")
                    if soft:
                        write_vad_demo_video(
                            frames,
                            load_classifier_labels(soft[0], 1).ravel(),
                            stem + "_soft_audio.mp4", audio_wav=audio)

    if not rows:
        raise SystemExit(f"no classifier outputs matched under {args.classifier_dir} "
                         f"({missing} missing)")
    if no_video:
        print(f"note: {no_video} utterances skipped for --with-videos "
              f"(no matlab_raw video h5, or non-scalar labels)")
    if missing:
        print(f"note: {missing} utterances had no classifier output")
    stats_dir = args.stats_dir or args.classifier_dir
    try:
        compute_stats(["accuracy", "precision", "recall", "f1"], rows,
                      stats_dir, args.confidence, all_speakers=speakers)
    except OSError as e:
        # scoring shipped artifacts in a read-only tree: the tables were
        # already printed before the final stats.json write failed
        print(f"note: stats.json not written ({e}); pass --stats-dir for a "
              f"writable destination")


if __name__ == "__main__":
    main()
