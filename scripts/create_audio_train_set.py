#!/usr/bin/env python
"""Copy clean/noisy wavs into the processed layout, write per-utterance label
h5s and the noisy log-power statistics h5.

Mirrors /root/reference/scripts/create_audio_train_set.py."""

import argparse

from _lib import add_common, maybe_force_platform, processed_dir, raw_dir


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__), host_job=True)
    ap.add_argument("--splits", nargs="+", default=["train", "validation", "test"])
    ap.add_argument("--workers", type=int, default=None)
    args = ap.parse_args()
    maybe_force_platform(args)

    from dvae_tpu.data.builders import build_audio_train_set

    build_audio_train_set(raw_dir(args), processed_dir(args),
                          dataset_types=tuple(args.splits), labels=args.labels,
                          dataset_size=args.dataset_size, workers=args.workers)
    print("done")


if __name__ == "__main__":
    main()
