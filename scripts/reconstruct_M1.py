#!/usr/bin/env python
"""M1 encode-decode analysis on QUT-mixture triplets (_s/_n/_x.wav).

Mirrors /root/reference/scripts/reconstruct_M1.py: reconstruct the clean and
noisy spectrograms through the trained M1 VAE and save the reference's
two-figure set per utterance (``_s_recon.png`` = clean + two oracle-VAD-
masked reconstruction rows, ``_x_recon.png`` = mixture / clean+mask /
noisy-reconstruction+mask — reconstruct_M1.py:188-256)."""

import argparse
import os

from _lib import add_common, maybe_force_platform, processed_dir


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__))
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--z-dim", type=int, default=16)
    ap.add_argument("--h-dim", type=int, nargs="+", default=[128, 128])
    ap.add_argument("--output-dir", default="figures/reconstruct_M1")
    ap.add_argument("--max-utts", type=int, default=10)
    args = ap.parse_args()
    maybe_force_platform(args)

    import glob

    import jax
    import jax.numpy as jnp

    from dvae_tpu.data.io import read_wav
    from dvae_tpu.eval import reconstruct as rec
    from dvae_tpu.models import VAE
    from dvae_tpu.train import checkpoint as ckpt

    model = VAE(x_dim=513, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    params_t = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)))
    path = args.checkpoint or ckpt.best_checkpoint(args.model_dir)
    params = ckpt.load_checkpoint(path, params_t)

    qut_dir = os.path.join(processed_dir(args), "ntcd_timit/qutnoise_databases")
    triplets = sorted(glob.glob(qut_dir + "/**/*_x.wav", recursive=True))[: args.max_utts]
    if not triplets:
        raise SystemExit(f"no QUT mixtures under {qut_dir}; run create_test_set.py first")

    for x_path in triplets:
        base = x_path[: -len("_x.wav")]
        name = os.path.basename(base)
        s_wav, _ = read_wav(base + "_s.wav")
        x_wav, _ = read_wav(x_path)
        S, s2 = rec.power_spec(s_wav)
        X, x2 = rec.power_spec(x_wav)
        recon_s = rec.reconstruct(model, params, s2)
        recon_x = rec.reconstruct(model, params, x2)
        # the reference reads the oracle VAD from the builder h5
        # (reconstruct_M1.py:172-177); recomputing it from the clean wav is
        # value-identical (the h5 was built with the same function and the
        # threshold is scale-invariant)
        y = rec.oracle_vad(s_wav)
        rec.m1_figure_set(os.path.join(args.output_dir, name),
                          s_wav, x_wav, S, X, recon_s, recon_x, y)
        print(f"reconstructed {name}")


if __name__ == "__main__":
    main()
