#!/usr/bin/env python
"""M2-info reconstruction probe on NTCD noisy pairs.

Mirrors /root/reference/scripts/reconstruct_ntcd_M2_info.py:188-490: the
reference six-figure set per pair — clean decode with the model's OWN
classifier prediction next to the oracle decode (``_s_recon``), noisy
decodes with oracle / ŷ_soft / ones / zeros conditioning (``_x_recon``,
``_x_recon_soft``, ``_x_recon_ones``, ``_x_recon_zeros``), and the
auxiliary classifier's z-based prediction (``_recon_aux``). Frames trimmed
to the oracle-label length (= the reference's upsampled-video trim)."""

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
    ap.add_argument("--output-dir", default="figures/reconstruct_ntcd_M2_info")
    ap.add_argument("--max-utts", type=int, default=10)
    args = ap.parse_args()
    if args.labels != "vad_labels":
        # consistent with evaluate_ntcd_M2_info_vad.py: the M2-info model is
        # VAD-conditioned; silently ignoring the flag would lie to the user
        ap.error("the M2-info model is VAD-conditioned; use --labels vad_labels")
    maybe_force_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.data.catalog import ntcd_timit
    from dvae_tpu.data.io import read_wav
    from dvae_tpu.enhance.evaluate import load_oracle_labels
    from dvae_tpu.eval import reconstruct as rec
    from dvae_tpu.models import DisentangledVAE, init_params
    from dvae_tpu.train import checkpoint as ckpt

    model = DisentangledVAE(x_dim=513, y_dim=1, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    params_t = init_params(
        model, {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)), jnp.ones((4, 1)))
    path = args.checkpoint or ckpt.best_checkpoint(args.model_dir)
    params = ckpt.load_checkpoint(path, params_t)

    proc = processed_dir(args)
    pairs = ntcd_timit.proc_noisy_clean_pair_dict(
        proc + "/", "test", args.dataset_size, "vad_labels", upsampled=True)
    items = list(pairs.items())
    if args.snr:
        items = [it for it in items if it[0].split("/")[-4] == args.snr]
    items = items[: args.max_utts]

    for noisy_rel, clean_rel in items:
        snr = noisy_rel.split("/")[-4]
        noise = noisy_rel.split("/")[-5]
        name = f"{noise}_{snr}_{os.path.splitext(os.path.basename(noisy_rel))[0]}"
        paths = rec.ntcd_pair_wavs(proc, noisy_rel, clean_rel, "vad_labels")
        if paths is None:
            continue
        s_wav, _ = read_wav(paths[0])
        x_wav, _ = read_wav(paths[1])
        S, s2 = rec.power_spec(s_wav)
        X, x2 = rec.power_spec(x_wav)
        y = load_oracle_labels(os.path.join(proc, clean_rel))
        n = min(len(y), s2.shape[0], x2.shape[0])
        y = y[:n]
        # the model's own x->y classification of the CLEAN spectrogram
        # (reconstruct_ntcd_M2_info.py:195-197)
        y_hat_soft = np.asarray(model.apply(params, jnp.asarray(s2[:n], jnp.float32),
                                            method="classify_from_x"))
        recon_clean_soft, z = rec.reconstruct(model, params, s2[:n], y_hat_soft,
                                              return_z=True)
        recon_clean_oracle = rec.reconstruct(model, params, s2[:n], y)
        recon_x_oracle = rec.reconstruct(model, params, x2[:n], y)
        recon_x_soft = rec.reconstruct(model, params, x2[:n], y_hat_soft)
        recon_x_ones = rec.reconstruct(model, params, x2[:n], np.ones_like(y))
        recon_x_zeros = rec.reconstruct(model, params, x2[:n], np.zeros_like(y))
        # auxiliary classifier on the clean-soft encode's latent
        # (reconstruct_ntcd_M2_info.py:459-461)
        yz_soft = np.asarray(model.apply(params, jnp.asarray(z, jnp.float32),
                                         method="classify_from_z"))
        rec.m2_info_figure_set(os.path.join(args.output_dir, name),
                               s_wav, x_wav, S[:n], X[:n],
                               recon_clean_soft, recon_clean_oracle,
                               recon_x_oracle, recon_x_soft,
                               recon_x_ones, recon_x_zeros,
                               y, y_hat_soft, yz_soft)
        print(f"reconstructed {name}")


if __name__ == "__main__":
    main()
