#!/usr/bin/env python
"""Synthesize QUT-noise test mixtures (_s/_n/_x.wav triplets + SNR pickle).

Mirrors /root/reference/scripts/create_test_set.py (seeded random noise type
and SNR per utterance, power-ratio noise gain, joint renormalization)."""

import argparse
import os

from _lib import add_common, maybe_force_platform, processed_dir, raw_dir


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__), host_job=True)
    ap.add_argument("--noise-dir", default=None,
                    help="dir with preprocessed QUT noise wavs (default: data/complete/processed/qut_noise)")
    ap.add_argument("--snrs", type=float, nargs="+",
                    default=[-15.0, -10.0, -5.0, 0.0, 5.0])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--split", default="test")
    args = ap.parse_args()
    maybe_force_platform(args)

    from dvae_tpu.data.builders import build_qut_test_set

    noise_dir = args.noise_dir or os.path.join(
        args.data_root, "complete", "processed", "qut_noise")
    out_dir = os.path.join(processed_dir(args), "ntcd_timit", "qutnoise_databases")
    snrs = build_qut_test_set(raw_dir(args), noise_dir, out_dir,
                              dataset_type=args.split, snrs=tuple(args.snrs),
                              seed=args.seed)
    print(f"mixed {len(snrs)} utterances -> {out_dir}")


if __name__ == "__main__":
    main()
