#!/usr/bin/env python
"""M2-info reconstruction probe on QUT mixtures: decode with the model's OWN
classifier prediction (y_hat_soft), the oracle y, and the ones/zeros
ablations. Mirrors /root/reference/scripts/reconstruct_M2_info.py:194-228."""

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
        S, s2 = rec.power_spec(s_wav)
        y_oracle = rec.oracle_vad(s_wav)[:, None]
        y_hat_soft = np.asarray(model.apply(params, jnp.asarray(s2, jnp.float32),
                                            method="classify_from_x"))
        variants = {"yhatsoft": y_hat_soft, **rec.label_variants(y_oracle)}
        for tag, y_var in variants.items():
            r = rec.reconstruct(model, params, s2, y_var)
            out = os.path.join(args.output_dir, f"{name}_s_recon_{tag}.png")
            rec.save_reconstruction_figure(out, s_wav, S, r,
                                           y_oracle if tag == "y" else None)
        print(f"reconstructed {name}")


if __name__ == "__main__":
    main()
