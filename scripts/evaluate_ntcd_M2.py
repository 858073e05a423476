#!/usr/bin/env python
"""Enhance the noisy NTCD-TIMIT test set with M2 (label-conditioned) + MCEM.

Mirrors /root/reference/scripts/evaluate_ntcd_M2.py: y comes from the oracle
label h5s or from precomputed video-classifier outputs (*_y_hat_hard.pt,
produced by the sibling audio-visual-vad repo)."""

import argparse
import os

from _lib import (ablation_of, add_ablation, add_common, add_mcem_budgets,
                  add_shard, add_std_norm_eval,
                  default_out_dir, make_mesh_if, mcem_config_of,
                  maybe_force_platform, norm_stats_if, shard_of, processed_dir, y_dim_for)


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__))
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--z-dim", type=int, default=16)
    ap.add_argument("--h-dim", type=int, nargs="+", default=[128, 128])
    add_mcem_budgets(ap)
    ap.add_argument("--snr", default="10")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard each utterance batch over all visible devices")
    ap.add_argument("--y-source", default="oracle", choices=["oracle", "classifier", "ones", "zeros"],
                    help="oracle h5 labels, classifier .pt outputs, or constant-label ablations (reference *_oracle_0/1 goldens)")
    ap.add_argument("--classifier-dir", default=None,
                    help="dir with *_y_hat_hard.pt when --y-source classifier")
    ap.add_argument("--model-variant", default="v1", choices=["v1", "v2"],
                    help="v1 = DeepGenerativeModel (encoder sees [x;y], "
                    "MCEM_M2 semantics); v2 = DeepGenerativeModel_v2 "
                    "(encoder on x only, MCEM_M2v2 semantics mcem.py:504 — "
                    "the shipped ntcd_M2v2_VAD golden family)")
    ap.add_argument("--output-dir", default=None)
    add_ablation(ap)
    add_std_norm_eval(ap)
    add_shard(ap)
    args = ap.parse_args()
    if args.y_source == "classifier" and not args.classifier_dir:
        ap.error("--y-source classifier requires --classifier-dir")
    maybe_force_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.enhance.evaluate import (evaluate_sweep,
                                           find_classifier_labels,
                                           load_oracle_labels)
    from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
    from dvae_tpu.models import CVAE, CVAE_v2
    from dvae_tpu.train import checkpoint as ckpt

    y_dim = y_dim_for(args.labels)
    model_cls = CVAE if args.model_variant == "v1" else CVAE_v2
    model = model_cls(x_dim=513, y_dim=y_dim, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    params_t = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)), jnp.ones((4, y_dim)),
    )
    path = args.checkpoint or ckpt.best_checkpoint(args.model_dir)
    params = ckpt.load_checkpoint(path, params_t)
    print(f"loaded {path}")

    proc = processed_dir(args)

    def y_loader(noisy_rel, clean_rel):
        if args.y_source == "oracle":
            return load_oracle_labels(os.path.join(proc, clean_rel))
        if args.y_source == "classifier":
            base = os.path.splitext(os.path.basename(noisy_rel))[0]
            spk = noisy_rel.split("/")[-2]
            # rel_dir: prefer labels predicted from THIS noise/SNR condition
            # (predict_vad_labels --source noisy mirrors the noisy tree)
            return find_classifier_labels(args.classifier_dir, spk, base,
                                          y_dim,
                                          rel_dir=os.path.dirname(noisy_rel))
        n = load_oracle_labels(os.path.join(proc, clean_rel)).shape[0]
        const = 1.0 if args.y_source == "ones" else 0.0
        return np.full((n, y_dim), const, dtype=np.float32)

    suffix = {"oracle": "", "classifier": "_y_hat_hard",
              "ones": "_oracle_1", "zeros": "_oracle_0"}[args.y_source]

    from _lib import warn_peem_family

    warn_peem_family(args, "m2" if args.model_variant == "v1" else "m2v2",
                     y_dim)
    y_mode = "enc_dec" if args.model_variant == "v1" else "dec_only"
    enh = Enhancer(model, params, EnhancerConfig(
        mcem=mcem_config_of(args), y_mode=y_mode,
        ablation=ablation_of(args), norm=norm_stats_if(args),
        engine=args.engine),
        mesh=make_mesh_if(args))
    out_dir = default_out_dir(args, path)
    n = evaluate_sweep(
        enh, proc, out_dir, dataset_size=args.dataset_size, labels=args.labels,
        snr_filter=None if args.snr == "all" else args.snr,
        batch_size=args.batch_size, shard=shard_of(args), y_loader=y_loader, suffix=suffix)
    print(f"done: {n} utterances -> {out_dir}")


if __name__ == "__main__":
    main()
