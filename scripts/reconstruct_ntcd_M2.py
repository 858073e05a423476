#!/usr/bin/env python
"""M2 label-swap disentanglement probe on NTCD noisy pairs.

Mirrors /root/reference/scripts/reconstruct_ntcd_M2.py:242-393 (y from the
oracle label h5s or precomputed classifier .pt outputs, :194-219): the
reference four-figure set — ``_s_recon`` (oracle-conditioned clean decode)
plus ``_x_recon`` / ``_x_recon_ones`` / ``_x_recon_zeros`` noisy decodes
over mixture + clean-reference rows."""

import argparse
import os

from _lib import add_common, maybe_force_platform, processed_dir, y_dim_for


def main():
    ap = add_common(argparse.ArgumentParser(description=__doc__))
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--z-dim", type=int, default=16)
    ap.add_argument("--h-dim", type=int, nargs="+", default=[128, 128])
    ap.add_argument("--snr", default=None)
    ap.add_argument("--y-source", default="oracle", choices=["oracle", "classifier"])
    ap.add_argument("--classifier-dir", default=None)
    ap.add_argument("--model-variant", default="v1", choices=["v1", "v2"],
                    help="v1 = DeepGenerativeModel (encoder sees [x;y]); "
                    "v2 = DeepGenerativeModel_v2 (encoder on x only) for "
                    "training_M2.py --model-variant v2 checkpoints")
    ap.add_argument("--output-dir", default="figures/reconstruct_ntcd_M2")
    ap.add_argument("--max-utts", type=int, default=10)
    args = ap.parse_args()
    if args.y_source == "classifier" and not args.classifier_dir:
        ap.error("--y-source classifier requires --classifier-dir")
    maybe_force_platform(args)

    import jax
    import jax.numpy as jnp

    from dvae_tpu.data.catalog import ntcd_timit
    from dvae_tpu.data.io import read_wav
    from dvae_tpu.enhance.evaluate import find_classifier_labels, load_oracle_labels
    from dvae_tpu.eval import reconstruct as rec
    from dvae_tpu.models import CVAE, CVAE_v2
    from dvae_tpu.train import checkpoint as ckpt

    y_dim = y_dim_for(args.labels)
    model_cls = CVAE if args.model_variant == "v1" else CVAE_v2
    model = model_cls(x_dim=513, y_dim=y_dim, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    params_t = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)), jnp.ones((4, y_dim)))
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
        if args.y_source == "oracle":
            y = load_oracle_labels(os.path.join(proc, clean_rel))
        else:
            base = os.path.splitext(os.path.basename(noisy_rel))[0]
            spk = noisy_rel.split("/")[-2]
            # rel_dir: prefer labels predicted from THIS noise/SNR condition
            # (predict_vad_labels --source noisy mirrors the noisy tree)
            y = find_classifier_labels(args.classifier_dir, spk, base, y_dim,
                                       rel_dir=os.path.dirname(noisy_rel))
        n = min(len(y), s2.shape[0], x2.shape[0])
        y = y[:n]
        recon_s = rec.reconstruct(model, params, s2[:n], y)
        variants = rec.label_variants(y)
        recon_x = {tag: rec.reconstruct(model, params, x2[:n], yv)
                   for tag, yv in variants.items()}
        rec.m2_figure_set(os.path.join(args.output_dir, name),
                          s_wav, x_wav, S[:n], X[:n], recon_s,
                          recon_x["y"], recon_x["ones"], recon_x["zeros"], y)
        print(f"reconstructed {name}")


if __name__ == "__main__":
    main()
