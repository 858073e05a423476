#!/usr/bin/env python
"""Train the disentangled M2-info model (adversarial two-optimizer game).

Mirrors /root/reference/scripts/training_M2_info_vad.py: the encoder/decoder/
classifier group minimizes ELBO + alpha*BCE(y_hat_x, y) - beta*BCE(y_hat_z, y)
while the auxiliary z->y classifier trains on detached latents. See
dvae_tpu.train.steps.make_adversarial_step for the --legacy-aux-coupling
note (the reference's un-zeroed aux gradients)."""

import argparse
import os

from _lib import add_common, frame_h5_path, make_mesh_if, maybe_force_platform


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__), training=True)
    ap.add_argument("--alpha", type=float, default=0.0)
    ap.add_argument("--beta", type=float, default=10.0)
    ap.add_argument("--gamma", type=float, default=1.0)
    ap.add_argument("--legacy-aux-coupling", action="store_true")
    ap.add_argument("--enc-adversary", default="bce",
                    choices=["bce", "uniform", "entropy"],
                    help="the -beta encoder-adversary term. Default 'bce' "
                         "(labeled, the script's live line, reference "
                         ":171, name tag Lenc_aux_v1); 'uniform'/'entropy' "
                         "= the commented _v2/_v3 experiments (reference "
                         ":172-173; the pretrain script runs _v3 live)")
    ap.add_argument("--model-variant", default="v5", choices=["v5", "v4"],
                    help="v5 = DeepGenerativeModel_v5 (default); v4 = the "
                    "flat-tree CVAE_v4 behind the reference's shipped "
                    "ntcd_M2v4_VAD_alpha_*_beta_* golden checkpoints "
                    "(models.py:299-333; same four modules, no wrapper)")
    ap.add_argument("--y-cond", default="ytrue",
                    choices=["ytrue", "soft", "yhathard", "hardlabel"],
                    help="decoder conditioning label; the v4 golden names' "
                    "_hardlabel/_yhathard suffixes = hard own-classifier "
                    "prediction ('soft' = the _pretrain script's forward)")
    args = ap.parse_args()
    if args.device_data and args.no_in_memory:
        ap.error("--device-data uploads the in-memory split once; "
                 "drop --no-in-memory")
    maybe_force_platform(args)

    from dvae_tpu.data.datasets import FrameDataset
    from dvae_tpu.models import CVAE_v4, DisentangledVAE
    from dvae_tpu.train.loop import LoopConfig, fit_adversarial

    h5 = frame_h5_path(args)
    train_ds = FrameDataset(h5, "train", in_memory=not args.no_in_memory)
    valid_ds = FrameDataset(h5, "validation", in_memory=not args.no_in_memory)

    model_cls = DisentangledVAE if args.model_variant == "v5" else CVAE_v4
    model = model_cls(x_dim=513, y_dim=1, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    norm = "norm" if args.std_norm else "nonorm"
    hdim = "_".join(f"{h:03d}" for h in args.h_dim)
    vtag = {"bce": "v1", "uniform": "v2", "entropy": "v3"}[args.enc_adversary]
    if args.model_variant == "v4":
        # the v4 golden families' grammar: ntcd_M2v4_VAD_alpha_{a}_beta_{b}
        # [_hardlabel|_yhathard]_nonorm_... (gamma is not in the name); a
        # non-default adversary gets its Lenc_aux tag so distinct
        # objectives never share a checkpoint dir
        cond_suffix = {"ytrue": "", "soft": "_ysoft", "yhathard": "_yhathard",
                       "hardlabel": "_hardlabel"}[args.y_cond]
        adv_suffix = "" if args.enc_adversary == "bce" else f"_Lenc_aux_{vtag}"
        default_name = (
            f"ntcd_M2v4_VAD_alpha_{args.alpha}_beta_{args.beta}{cond_suffix}"
            f"{adv_suffix}_{norm}_hdim_{hdim}_zdim_{args.z_dim:03d}"
            f"_end_epoch_{args.end_epoch:03d}"
        )
    else:
        # non-default y_cond enters the name too (the golden grammar has no
        # segment for it because the reference only trains ytrue here)
        cond_suffix = {"ytrue": "", "soft": "_ysoft", "yhathard": "_yhathard",
                       "hardlabel": "_hardlabel"}[args.y_cond]
        default_name = (
            f"ntcd_M2_info_VAD_Lenc_aux_{vtag}_alpha_{args.alpha}_beta_{args.beta}"
            f"_gamma_{args.gamma}_y{cond_suffix}_{norm}_hdim_{hdim}"
            f"_zdim_{args.z_dim:03d}"
            f"_end_epoch_{args.end_epoch:03d}"
        )
    model_name = args.run_name or default_name
    cfg = LoopConfig(
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        start_epoch=args.start_epoch, end_epoch=args.end_epoch,
        log_interval=args.log_interval, seed=args.seed, std_norm=args.std_norm,
        steps_per_dispatch=args.steps_per_dispatch,
        device_data=args.device_data,
    )
    model_dir = os.path.join(args.models_root, model_name)
    print(f"training {model_name}")
    fit_adversarial(model, train_ds, valid_ds, model_dir, "M2",
                    alpha=args.alpha, beta=args.beta, gamma=args.gamma,
                    cfg=cfg, mesh=make_mesh_if(args),
                    legacy_aux_coupling=args.legacy_aux_coupling,
                    y_cond=args.y_cond, enc_adversary=args.enc_adversary)


if __name__ == "__main__":
    main()
