#!/usr/bin/env python
"""M1 encode-decode analysis on NTCD noisy/clean pairs.

Mirrors /root/reference/scripts/reconstruct_ntcd_M1.py:215-281: the
reference two-figure set per pair (``_s_recon.png`` clean + masked
reconstruction rows, ``_x_recon.png`` mixture / clean+mask /
noisy-reconstruction+mask), frames trimmed to the oracle-label length (the
reference trims to the upsampled-video frame count, which is what the
label h5 length encodes)."""

import argparse
import os

from _lib import add_common, maybe_force_platform, processed_dir


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__))
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--z-dim", type=int, default=16)
    ap.add_argument("--h-dim", type=int, nargs="+", default=[128, 128])
    ap.add_argument("--snr", default=None)
    ap.add_argument("--output-dir", default="figures/reconstruct_ntcd_M1")
    ap.add_argument("--max-utts", type=int, default=10)
    args = ap.parse_args()
    maybe_force_platform(args)

    import jax
    import jax.numpy as jnp

    from dvae_tpu.data.catalog import ntcd_timit
    from dvae_tpu.data.io import read_wav
    from dvae_tpu.enhance.evaluate import load_oracle_labels
    from dvae_tpu.eval import reconstruct as rec
    from dvae_tpu.models import VAE
    from dvae_tpu.train import checkpoint as ckpt

    model = VAE(x_dim=513, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    params_t = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)))
    path = args.checkpoint or ckpt.best_checkpoint(args.model_dir)
    params = ckpt.load_checkpoint(path, params_t)

    proc = processed_dir(args)
    pairs = ntcd_timit.proc_noisy_clean_pair_dict(
        proc + "/", "test", args.dataset_size, args.labels, upsampled=True)
    items = list(pairs.items())
    if args.snr:
        items = [it for it in items if it[0].split("/")[-4] == args.snr]
    items = items[: args.max_utts]

    for noisy_rel, clean_rel in items:
        snr = noisy_rel.split("/")[-4]
        noise = noisy_rel.split("/")[-5]
        name = f"{noise}_{snr}_{os.path.splitext(os.path.basename(noisy_rel))[0]}"
        paths = rec.ntcd_pair_wavs(proc, noisy_rel, clean_rel, args.labels)
        if paths is None:
            continue
        s_wav, _ = read_wav(paths[0])
        x_wav, _ = read_wav(paths[1])
        S, s2 = rec.power_spec(s_wav)
        X, x2 = rec.power_spec(x_wav)
        y = load_oracle_labels(os.path.join(proc, clean_rel))
        n = min(len(y), s2.shape[0], x2.shape[0])
        recon_s = rec.reconstruct(model, params, s2[:n])
        recon_x = rec.reconstruct(model, params, x2[:n])
        rec.m1_figure_set(os.path.join(args.output_dir, name),
                          s_wav, x_wav, S[:n], X[:n], recon_s, recon_x, y[:n])
        print(f"reconstructed {name}")


if __name__ == "__main__":
    main()
