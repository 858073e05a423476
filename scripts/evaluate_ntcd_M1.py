#!/usr/bin/env python
"""Enhance the noisy NTCD-TIMIT test set with M1 + MCEM.

Mirrors /root/reference/scripts/evaluate_ntcd_M1.py, with the GPU process
pool replaced by device-batched MCEM (one jitted program per shape bucket).
Outputs land in <models-root>/<model>/<noisy rel path>_{s,n}_est.wav with
resume-by-skip."""

import argparse

from _lib import (ablation_of, add_ablation, add_common, add_mcem_budgets,
                  add_shard, add_std_norm_eval,
                  default_out_dir, make_mesh_if, mcem_config_of,
                  maybe_force_platform, norm_stats_if, shard_of, processed_dir)


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__))
    ap.add_argument("--checkpoint", default=None,
                    help=".msgpack checkpoint; defaults to best in --model-dir")
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--z-dim", type=int, default=16)
    ap.add_argument("--h-dim", type=int, nargs="+", default=[128, 128])
    add_mcem_budgets(ap)
    ap.add_argument("--m1-reference-budgets", action="store_true",
                    help="use the MH budgets the reference's MCEM_M1 "
                         "ACTUALLY runs (E-step 30/30, WF 75/30) rather "
                         "than its nominal settings — its E_step passes the "
                         "budgets positionally into an unused y parameter "
                         "(reference mcem.py:207,297,314); see "
                         "McemConfig.m1_reference_effective. Explicit "
                         "budget flags override the corresponding fields")
    ap.add_argument("--snr", default="10", help="SNR filter ('all' = every SNR)")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard each utterance batch over all visible devices")
    ap.add_argument("--output-dir", default=None)
    add_ablation(ap)
    add_std_norm_eval(ap)
    add_shard(ap)
    args = ap.parse_args()
    maybe_force_platform(args)

    import jax
    import jax.numpy as jnp

    from dvae_tpu.enhance.evaluate import evaluate_sweep
    from dvae_tpu.enhance.mcem import McemConfig
    from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
    from dvae_tpu.models import VAE
    from dvae_tpu.train import checkpoint as ckpt

    model = VAE(x_dim=513, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    params_t = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)),
    )
    path = args.checkpoint or ckpt.best_checkpoint(args.model_dir)
    params = ckpt.load_checkpoint(path, params_t)
    print(f"loaded {path}")

    if args.m1_reference_budgets:
        # the reference M1's EFFECTIVE budgets as the baseline, with any
        # explicitly-passed budget flag still winning
        eff = McemConfig.m1_reference_effective()
        mcem = mcem_config_of(
            args, **{f: getattr(args, f) if getattr(args, f) is not None
                     else getattr(eff, f)
                     for f in ("nsamples_e_step", "burnin_e_step",
                               "nsamples_wf", "burnin_wf")})
    else:
        mcem = mcem_config_of(args)
    enh = Enhancer(model, params,
                   EnhancerConfig(mcem=mcem,
                                  ablation=ablation_of(args),
                                  norm=norm_stats_if(args),
                                  engine=args.engine),
                   mesh=make_mesh_if(args))
    out_dir = default_out_dir(args, path)
    n = evaluate_sweep(
        enh, processed_dir(args), out_dir,
        dataset_size=args.dataset_size, labels=args.labels,
        snr_filter=None if args.snr == "all" else args.snr,
        batch_size=args.batch_size, shard=shard_of(args),
    )
    print(f"done: {n} utterances -> {out_dir}")


if __name__ == "__main__":
    main()
