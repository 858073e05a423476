#!/usr/bin/env python
"""M2 label-swap disentanglement probe on QUT mixtures.

Mirrors /root/reference/scripts/reconstruct_M2.py:204-355: the reference
four-figure set per utterance — oracle-conditioned clean decode
(``_s_recon``), then the NOISY spectrogram decoded with oracle / all-ones /
all-zeros labels (``_x_recon``, ``_x_recon_ones``, ``_x_recon_zeros``),
each over the mixture and clean-reference rows — a visual check of how
much the reconstruction depends on the label."""

import argparse
import os

from _lib import add_common, maybe_force_platform, processed_dir, y_dim_for


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__))
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--z-dim", type=int, default=16)
    ap.add_argument("--h-dim", type=int, nargs="+", default=[128, 128])
    ap.add_argument("--output-dir", default="figures/reconstruct_M2")
    ap.add_argument("--max-utts", type=int, default=10)
    ap.add_argument("--model-variant", default="v1", choices=["v1", "v2"],
                    help="v1 = DeepGenerativeModel (encoder sees [x;y]); "
                    "v2 = DeepGenerativeModel_v2 (encoder on x only) for "
                    "training_M2.py --model-variant v2 checkpoints")
    args = ap.parse_args()
    maybe_force_platform(args)

    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.data.io import read_wav
    from dvae_tpu.eval import reconstruct as rec
    from dvae_tpu.models import CVAE, CVAE_v2
    from dvae_tpu.ops.targets import clean_speech_ibm
    from dvae_tpu.train import checkpoint as ckpt

    y_dim = y_dim_for(args.labels)
    model_cls = CVAE if args.model_variant == "v1" else CVAE_v2
    model = model_cls(x_dim=513, y_dim=y_dim, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    params_t = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)), jnp.ones((4, y_dim)))
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
        if y_dim == 1:
            y = rec.oracle_vad(s_wav)[:, None]
        else:
            # magnitude upload: complex host->device transfers fail over the
            # axon tunnel; clean_speech_ibm takes abs() first anyway
            y = np.asarray(clean_speech_ibm(jnp.asarray(np.abs(S), np.float32)))
        recon_s = rec.reconstruct(model, params, s2, y)
        variants = rec.label_variants(y)
        recon_x = {tag: rec.reconstruct(model, params, x2, yv)
                   for tag, yv in variants.items()}
        rec.m2_figure_set(os.path.join(args.output_dir, name),
                          s_wav, x_wav, S, X, recon_s,
                          recon_x["y"], recon_x["ones"], recon_x["zeros"], y)
        print(f"reconstructed {name}")


if __name__ == "__main__":
    main()
