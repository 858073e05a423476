#!/usr/bin/env python
"""Build the upsampled lip-video h5s + label h5s + pixel statistics.

Mirrors /root/reference/scripts/create_video_train_files.py (IDCT ->
normalize -> rot90 -> 62.5 fps upsample); see
dvae_tpu.data.builders.build_video_files for the ffmpeg-free upsampling
note."""

import argparse

from _lib import add_common, maybe_force_platform, processed_dir, raw_dir


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__), host_job=True)
    ap.add_argument("--splits", nargs="+", default=["train", "validation", "test"])
    ap.add_argument("--workers", type=int, default=None)
    args = ap.parse_args()
    maybe_force_platform(args)

    from dvae_tpu.data.builders import build_video_files

    build_video_files(raw_dir(args), processed_dir(args),
                      dataset_types=tuple(args.splits), labels=args.labels,
                      workers=args.workers)
    print("done")


if __name__ == "__main__":
    main()
