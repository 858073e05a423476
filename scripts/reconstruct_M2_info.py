#!/usr/bin/env python
"""M2-info reconstruction probe on QUT mixtures.

Mirrors /root/reference/scripts/reconstruct_M2_info.py:194-471: the
reference six-figure set per utterance — clean decode with the model's OWN
classifier prediction next to the oracle decode (``_s_recon``), noisy
decodes with oracle / ŷ_soft / ones / zeros conditioning (``_x_recon``,
``_x_recon_soft``, ``_x_recon_ones``, ``_x_recon_zeros``), and the
auxiliary classifier's z-based prediction (``_recon_aux``)."""

import argparse
import os

from _lib import add_common, maybe_force_platform, processed_dir


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__))
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--z-dim", type=int, default=16)
    ap.add_argument("--h-dim", type=int, nargs="+", default=[128, 128])
    ap.add_argument("--output-dir", default="figures/reconstruct_M2_info")
    ap.add_argument("--max-utts", type=int, default=10)
    args = ap.parse_args()
    maybe_force_platform(args)

    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.data.io import read_wav
    from dvae_tpu.eval import reconstruct as rec
    from dvae_tpu.models import DisentangledVAE, init_params
    from dvae_tpu.train import checkpoint as ckpt

    model = DisentangledVAE(x_dim=513, y_dim=1, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    params_t = init_params(
        model, {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)), jnp.ones((4, 1)))
    path = args.checkpoint or ckpt.best_checkpoint(args.model_dir)
    params = ckpt.load_checkpoint(path, params_t)

    qut_dir = os.path.join(processed_dir(args), "ntcd_timit/qutnoise_databases")
    mixtures = sorted(glob.glob(qut_dir + "/**/*_x.wav", recursive=True))[: args.max_utts]
    if not mixtures:
        raise SystemExit(f"no QUT mixtures under {qut_dir}")

    for x_path in mixtures:
        base = x_path[: -len("_x.wav")]
        name = os.path.basename(base)
        s_wav, _ = read_wav(base + "_s.wav")
        x_wav, _ = read_wav(x_path)
        S, s2 = rec.power_spec(s_wav)
        X, x2 = rec.power_spec(x_wav)
        y = rec.oracle_vad(s_wav)[:, None]
        # the model's own x->y classification of the CLEAN spectrogram
        # (reconstruct_M2_info.py:195-200)
        y_hat_soft = np.asarray(model.apply(params, jnp.asarray(s2, jnp.float32),
                                            method="classify_from_x"))
        recon_clean_soft, z = rec.reconstruct(model, params, s2, y_hat_soft,
                                              return_z=True)
        recon_clean_oracle = rec.reconstruct(model, params, s2, y)
        recon_x_oracle = rec.reconstruct(model, params, x2, y)
        recon_x_soft = rec.reconstruct(model, params, x2, y_hat_soft)
        recon_x_ones = rec.reconstruct(model, params, x2, np.ones_like(y))
        recon_x_zeros = rec.reconstruct(model, params, x2, np.zeros_like(y))
        # auxiliary classifier on the clean-soft encode's latent
        # (reconstruct_M2_info.py:440-442)
        yz_soft = np.asarray(model.apply(params, jnp.asarray(z, jnp.float32),
                                         method="classify_from_z"))
        rec.m2_info_figure_set(os.path.join(args.output_dir, name),
                               s_wav, x_wav, S, X,
                               recon_clean_soft, recon_clean_oracle,
                               recon_x_oracle, recon_x_soft,
                               recon_x_ones, recon_x_zeros,
                               y, y_hat_soft, yz_soft)
        print(f"reconstructed {name}")


if __name__ == "__main__":
    main()
