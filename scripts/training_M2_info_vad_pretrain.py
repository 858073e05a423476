#!/usr/bin/env python
"""Train M2-info warm-started from a pretrained classifier checkpoint.

Mirrors /root/reference/scripts/training_M2_info_vad_pretrain.py: loads a
previous checkpoint, keeps only the ``enc_dec_clf/classifier`` keys
(:103-113), and conditions the decoder on the classifier's soft prediction
y_hat_soft instead of the true label (:163). NOTE: the reference's attempt
to freeze the classifier is a no-op bug (:142-146, dotted names never match);
we do not replicate it — pass --freeze-classifier for a real freeze."""

import argparse
import os

from _lib import add_common, frame_h5_path, make_mesh_if, maybe_force_platform


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__), training=True)
    ap.add_argument("--alpha", type=float, default=0.0)
    ap.add_argument("--beta", type=float, default=10.0)
    ap.add_argument("--gamma", type=float, default=None,
                    help="auxiliary objective weight. Default: equal to "
                         "--beta — the reference pretrain script has no "
                         "gamma at all, its aux trains on beta*BCE "
                         "(training_M2_info_vad_pretrain.py:185); pass a "
                         "value to decouple them")
    ap.add_argument("--pretrained-checkpoint", required=True,
                    help=".msgpack checkpoint to surgically load the classifier from")
    ap.add_argument("--freeze-classifier", action="store_true")
    ap.add_argument("--legacy-aux-coupling", action="store_true")
    ap.add_argument("--enc-adversary", default="entropy",
                    choices=["entropy", "bce", "uniform"],
                    help="the -beta encoder-adversary term. Default "
                         "'entropy' = binary_cross_entropy_v3 of the "
                         "auxiliary's prediction — the reference PRETRAIN "
                         "script's live configuration (its :175, name tag "
                         "Lenc_aux_v3); 'bce' = the labeled adversary of "
                         "the non-pretrain script; 'uniform' = the "
                         "commented _v2 experiment (0.5-target)")
    args = ap.parse_args()
    if args.device_data and args.no_in_memory:
        ap.error("--device-data uploads the in-memory split once; "
                 "drop --no-in-memory")
    maybe_force_platform(args)

    import jax

    from dvae_tpu.data.datasets import FrameDataset
    from dvae_tpu.models import DisentangledVAE, init_params
    from dvae_tpu.train import checkpoint as ckpt
    from dvae_tpu.train.loop import LoopConfig, fit_adversarial

    h5 = frame_h5_path(args)
    train_ds = FrameDataset(h5, "train", in_memory=not args.no_in_memory)
    valid_ds = FrameDataset(h5, "validation", in_memory=not args.no_in_memory)

    model = DisentangledVAE(x_dim=513, y_dim=1, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    xb, yb = next(train_ds.batches(8))
    params = init_params(
        model,
        {"params": jax.random.PRNGKey(args.seed), "sample": jax.random.PRNGKey(args.seed + 1)},
        xb, yb,
    )
    params = ckpt.partial_load(args.pretrained_checkpoint, params, "enc_dec_clf/classifier")

    gamma = args.beta if args.gamma is None else args.gamma
    norm = "norm" if args.std_norm else "nonorm"
    hdim = "_".join(f"{h:03d}" for h in args.h_dim)
    # Lenc_aux_v{1,2,3} = the reference's name tag for the adversary form;
    # with the default (reference) gamma==beta the name follows the
    # reference grammar exactly (no gamma segment — its pretrain has none:
    # 'ntcd_M2_info_VAD_Lenc_aux_v3_alpha_{a}_beta_{b}_pretrain_yhatsoft_...')
    vtag = {"bce": "v1", "uniform": "v2", "entropy": "v3"}[args.enc_adversary]
    gamma_seg = "" if args.gamma is None else f"_gamma_{gamma}"
    model_name = args.run_name or (
        f"ntcd_M2_info_VAD_Lenc_aux_{vtag}_alpha_{args.alpha}"
        f"_beta_{args.beta}{gamma_seg}_pretrain_yhatsoft_{norm}"
        f"_hdim_{hdim}_zdim_{args.z_dim:03d}"
        f"_end_epoch_{args.end_epoch:03d}"
    )
    cfg = LoopConfig(
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        start_epoch=args.start_epoch, end_epoch=args.end_epoch,
        log_interval=args.log_interval, seed=args.seed, std_norm=args.std_norm,
        steps_per_dispatch=args.steps_per_dispatch,
        device_data=args.device_data,
    )
    model_dir = os.path.join(args.models_root, model_name)
    print(f"training {model_name} (warm-started classifier)")
    fit_adversarial(model, train_ds, valid_ds, model_dir, "M2",
                    alpha=args.alpha, beta=args.beta, gamma=gamma,
                    cfg=cfg, mesh=make_mesh_if(args),
                    init_params_override=params,
                    legacy_aux_coupling=args.legacy_aux_coupling,
                    use_y_hat_soft=True,
                    freeze_classifier=args.freeze_classifier,
                    enc_adversary=args.enc_adversary)


if __name__ == "__main__":
    main()
