#!/usr/bin/env python
"""Copy the pre-mixed Noisy_TCDTIMIT test wavs into the processed layout.

Mirrors /root/reference/scripts/create_audio_set_ntcd_noise.py."""

import argparse

from _lib import add_common, maybe_force_platform, processed_dir, raw_dir


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__), host_job=True)
    ap.add_argument("--split", default="test")
    args = ap.parse_args()
    maybe_force_platform(args)

    from dvae_tpu.data.builders import copy_ntcd_noisy_test

    n = copy_ntcd_noisy_test(raw_dir(args), processed_dir(args),
                             dataset_type=args.split, dataset_size=args.dataset_size)
    print(f"copied {n} noisy wavs")


if __name__ == "__main__":
    main()
