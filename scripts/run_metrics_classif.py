#!/usr/bin/env python
"""VAD/IBM classifier metrics: accuracy / precision / recall / F1 of stored
classifier outputs against the oracle labels, with CI tables per condition.

Mirrors /root/reference/scripts/run_metrics_classif.py:129-136 (classifier
outputs are *_y_hat_hard.pt tensors from the sibling audio-visual-vad repo,
or .npy arrays)."""

import argparse
import os

from _lib import add_common, maybe_force_platform, processed_dir


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__))
    ap.add_argument("--classifier-dir", required=True,
                    help="dir with <split>/<spk>/<utt>_y_hat_hard.pt outputs")
    ap.add_argument("--confidence", type=float, default=0.95)
    args = ap.parse_args()
    maybe_force_platform(args)

    import glob

    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.data.catalog import ntcd_timit
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

    rows, speakers = [], []
    missing = 0
    for lab_path in label_files:
        rel = os.path.relpath(lab_path, proc)
        spk = rel.split("/")[-2]
        utt = os.path.basename(rel).replace(suffix, "")
        cand = glob.glob(os.path.join(args.classifier_dir, "**", spk,
                                      utt + "_y_hat_hard.*"), recursive=True)
        if not cand:
            missing += 1
            continue
        y = load_oracle_labels(lab_path)
        y_hat = load_classifier_labels(cand[0])
        n = min(len(y), len(y_hat))
        acc, prec, rec, f1 = f1_loss(jnp.asarray(y_hat[:n].ravel()),
                                     jnp.asarray(y[:n].ravel()))
        rows.append([float(acc), float(prec), float(rec), float(f1)])
        speakers.append(spk)

    if not rows:
        raise SystemExit(f"no classifier outputs matched under {args.classifier_dir} "
                         f"({missing} missing)")
    if missing:
        print(f"note: {missing} utterances had no classifier output")
    compute_stats(["accuracy", "precision", "recall", "f1"], rows,
                  args.classifier_dir, args.confidence,
                  all_speakers=speakers)


if __name__ == "__main__":
    main()
