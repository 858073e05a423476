#!/usr/bin/env python
"""Train the M2v3 CVAE with the semi-supervised U_loss / L_loss objective.

RECONSTRUCTED trainer: the reference ships golden checkpoints named
``ntcd_M2v3_VAD_{Uloss|Lloss}_alpha_{A}[_hardlabel|_yhathard|_ytrue]_...``
(data/subset/models/) but no script that could have trained them — U_loss
and L_loss exist only as dead code (packages/models/utils.py:78-105). This
CLI recovers that capability; the objective/sign/conditioning semantics and
their evidence base (loss definitions, checkpoint-name grammar, vloss
forensics on the shipped names) are documented in
``dvae_tpu/train/steps.py::make_semisup_step``.

Example (reproduces the golden family's naming):
  training_M2v3_semisup.py --objective uloss --alpha -10 --y-cond hardlabel
  -> ntcd_M2v3_VAD_Uloss_alpha_-10.0_hardlabel_nonorm_hdim_128_128_zdim_016_...
"""

import argparse

from _lib import add_common, make_mesh_if, mangle, maybe_force_platform, y_dim_for


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__), training=True)
    ap.add_argument("--objective", default="uloss", choices=["uloss", "lloss"])
    ap.add_argument("--alpha", type=float, default=0.0,
                    help="weight of the -alpha*BCE(y_hat, y) classifier term "
                    "(positive = adversarial information-minimization)")
    ap.add_argument("--y-cond", default="soft",
                    choices=["soft", "yhathard", "hardlabel", "ytrue"],
                    help="decoder conditioning label (see make_semisup_step)")
    args = ap.parse_args()
    if args.device_data and args.no_in_memory:
        ap.error("--device-data uploads the in-memory split once; "
                 "drop --no-in-memory")
    if args.std_norm:
        ap.error("--std-norm is not supported here (all golden Uloss/Lloss "
                 "checkpoints are 'nonorm')")
    maybe_force_platform(args)

    from dvae_tpu.data.datasets import FrameDataset
    from dvae_tpu.models import CVAE_v3
    from dvae_tpu.train.loop import LoopConfig, fit_semisup

    from _lib import frame_h5_path

    h5 = frame_h5_path(args)
    train_ds = FrameDataset(h5, "train", in_memory=not args.no_in_memory)
    valid_ds = FrameDataset(h5, "validation", in_memory=not args.no_in_memory)
    y_dim = y_dim_for(args.labels)

    model = CVAE_v3(x_dim=513, y_dim=y_dim, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    lab = "VAD" if args.labels == "vad_labels" else "IBM"
    obj = "Uloss" if args.objective == "uloss" else "Lloss"
    cond_suffix = {"soft": "", "yhathard": "_yhathard",
                   "hardlabel": "_hardlabel", "ytrue": "_ytrue"}[args.y_cond]
    extra = f"{lab}_{obj}_alpha_{args.alpha:.1f}{cond_suffix}"
    model_name = mangle("ntcd_M2v3", args, extra=extra)
    cfg = LoopConfig(
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        start_epoch=args.start_epoch, end_epoch=args.end_epoch,
        log_interval=args.log_interval, seed=args.seed, std_norm=args.std_norm,
        steps_per_dispatch=args.steps_per_dispatch,
        device_data=args.device_data,
    )
    import os

    model_dir = os.path.join(args.models_root, model_name)
    print(f"training {model_name} (objective={args.objective}, "
          f"alpha={args.alpha}, y_cond={args.y_cond})")
    fit_semisup(model, train_ds, valid_ds, model_dir, "M2",
                objective=args.objective, alpha=args.alpha, y_cond=args.y_cond,
                cfg=cfg, mesh=make_mesh_if(args))


if __name__ == "__main__":
    main()
