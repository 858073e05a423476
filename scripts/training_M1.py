#!/usr/bin/env python
"""Train the M1 plain VAE on clean power-spectrogram frames.

Mirrors /root/reference/scripts/training_M1.py (batch 128, Adam 1e-4,
IS-ELBO, per-epoch validation + checkpoint named M1_epoch_xxx_vloss_yy.yy)
with a data-parallel mesh option replacing the single-GPU loop."""

import argparse

from _lib import (add_common, frame_h5_path, make_mesh_if, mangle,
                  maybe_force_platform)


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__), training=True)
    args = ap.parse_args()
    if args.device_data and args.no_in_memory:
        ap.error("--device-data uploads the in-memory split once; "
                 "drop --no-in-memory")
    maybe_force_platform(args)

    from dvae_tpu.data.datasets import FrameDataset
    from dvae_tpu.models import VAE
    from dvae_tpu.train.loop import LoopConfig, fit_vae

    h5 = frame_h5_path(args)
    train_ds = FrameDataset(h5, "train", in_memory=not args.no_in_memory)
    valid_ds = FrameDataset(h5, "validation", in_memory=not args.no_in_memory)

    model = VAE(x_dim=513, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    model_name = mangle("ntcd_M1", args)
    cfg = LoopConfig(
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        start_epoch=args.start_epoch, end_epoch=args.end_epoch,
        log_interval=args.log_interval, seed=args.seed, std_norm=args.std_norm,
        steps_per_dispatch=args.steps_per_dispatch,
        device_data=args.device_data,
    )
    import os

    model_dir = os.path.join(args.models_root, model_name)
    print(f"training {model_name} on {h5} ({len(train_ds)} frames)")
    fit_vae(model, train_ds, valid_ds, model_dir, "M1", conditional=False,
            cfg=cfg, mesh=make_mesh_if(args))


if __name__ == "__main__":
    main()
