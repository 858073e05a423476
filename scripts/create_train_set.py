#!/usr/bin/env python
"""Build the consolidated frame-level training h5
(Clean_<labels>_upsampled.h5 with X_/Y_<split> + train mean/std).

Mirrors /root/reference/scripts/create_train_set.py; see
dvae_tpu.data.builders.build_frame_dataset for the --legacy-video-trim note
(the reference's axis-0 trim bug that truncates utterances to 67 frames)."""

import argparse

from _lib import add_common, maybe_force_platform, processed_dir, raw_dir


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__), host_job=True)
    ap.add_argument("--splits", nargs="+", default=["train", "validation"])
    ap.add_argument("--legacy-video-trim", action="store_true")
    args = ap.parse_args()
    maybe_force_platform(args)

    from dvae_tpu.data.builders import build_frame_dataset

    out = build_frame_dataset(raw_dir(args), processed_dir(args),
                              labels=args.labels, dataset_types=tuple(args.splits),
                              proc_video_dir=processed_dir(args),
                              legacy_video_trim=args.legacy_video_trim)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
