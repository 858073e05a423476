#!/usr/bin/env python
"""Train the M2 conditional VAE (encoder([x;y]), decoder([z;y])).

Mirrors /root/reference/scripts/training_M2.py: y is the VAD label (y_dim=1)
or IBM mask (y_dim=513) per --labels."""

import argparse

from _lib import (add_common, frame_h5_path, make_mesh_if, mangle,
                  maybe_force_platform, y_dim_for)


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__), training=True)
    ap.add_argument("--model-variant", default="v1", choices=["v1", "v2"],
                    help="v1 = DeepGenerativeModel (encoder sees [x;y], the "
                    "reference script's model); v2 = DeepGenerativeModel_v2 "
                    "(encoder on x only, models.py:220 — the reference's "
                    "shipped ntcd_M2v2_VAD golden family, whose trainer is "
                    "not in its repo). Enhance v2 checkpoints with "
                    "evaluate_ntcd_M2.py --model-variant v2")
    args = ap.parse_args()
    if args.device_data and args.no_in_memory:
        ap.error("--device-data uploads the in-memory split once; "
                 "drop --no-in-memory")
    maybe_force_platform(args)

    from dvae_tpu.data.datasets import FrameDataset
    from dvae_tpu.models import CVAE, CVAE_v2
    from dvae_tpu.train.loop import LoopConfig, fit_vae

    h5 = frame_h5_path(args)
    train_ds = FrameDataset(h5, "train", in_memory=not args.no_in_memory)
    valid_ds = FrameDataset(h5, "validation", in_memory=not args.no_in_memory)
    y_dim = y_dim_for(args.labels)

    model_cls = CVAE if args.model_variant == "v1" else CVAE_v2
    model = model_cls(x_dim=513, y_dim=y_dim, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    lab = "VAD" if args.labels == "vad_labels" else "IBM"
    prefix = "ntcd_M2" if args.model_variant == "v1" else "ntcd_M2v2"
    model_name = mangle(prefix, args, extra=lab)
    cfg = LoopConfig(
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        start_epoch=args.start_epoch, end_epoch=args.end_epoch,
        log_interval=args.log_interval, seed=args.seed, std_norm=args.std_norm,
        steps_per_dispatch=args.steps_per_dispatch,
        device_data=args.device_data,
    )
    import os

    model_dir = os.path.join(args.models_root, model_name)
    print(f"training {model_name} (y_dim={y_dim})")
    fit_vae(model, train_ds, valid_ds, model_dir, "M2", conditional=True,
            cfg=cfg, mesh=make_mesh_if(args))


if __name__ == "__main__":
    main()
