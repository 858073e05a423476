#!/usr/bin/env python
"""M1 encode-decode analysis on QUT-mixture triplets (_s/_n/_x.wav).

Mirrors /root/reference/scripts/reconstruct_M1.py: reconstruct the clean and
noisy spectrograms through the trained M1 VAE and save comparison figures
with the oracle VAD overlay."""

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
        for tag, wav_path in (("s", base + "_s.wav"), ("x", x_path)):
            wav, _ = read_wav(wav_path)
            S, x2 = rec.power_spec(wav)
            r = rec.reconstruct(model, params, x2)
            vad = rec.oracle_vad(wav) if tag == "s" else None
            out = os.path.join(args.output_dir, f"{name}_{tag}_recon.png")
            rec.save_reconstruction_figure(out, wav, S, r, vad)
        print(f"reconstructed {name}")


if __name__ == "__main__":
    main()
