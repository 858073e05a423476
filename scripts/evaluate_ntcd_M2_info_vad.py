#!/usr/bin/env python
"""Enhance the noisy NTCD-TIMIT test set with the disentangled M2-info model.

Mirrors /root/reference/scripts/evaluate_ntcd_M2_info_vad.py: loads a v5
checkpoint, uses its enc_dec_clf CVAE (encoder on x only, decoder on [z;y] —
the MCEM_M2v3 configuration, mcem.py:676), with y from the oracle labels or
classifier outputs."""

import argparse
import os

from _lib import (ablation_of, add_ablation, add_common, add_mcem_budgets,
                  add_shard, add_std_norm_eval,
                  default_out_dir, make_mesh_if, mcem_config_of,
                  maybe_force_platform, norm_stats_if, shard_of, processed_dir)


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
    ap.add_argument("--y-source", default="oracle",
                    choices=["oracle", "classifier", "ones", "zeros",
                             "self-soft"],
                    help="'self-soft' conditions MCEM on the model's OWN "
                         "x->y classifier applied to the clean spectrogram "
                         "(soft probabilities) — the reference's commented "
                         "`y=y_hat_soft` experiment "
                         "(evaluate_ntcd_M2_info_vad.py:175,218,268); "
                         "outputs carry the _y_hat_soft suffix")
    ap.add_argument("--classifier-dir", default=None)
    ap.add_argument("--save-labels", action="store_true",
                    help="also write the labels MCEM is conditioned on as "
                         "<utt><suffix>.npy next to the enhanced wavs (the "
                         "reference's commented torch.save lines, "
                         "evaluate_ntcd_M2_info_vad.py:253-254); score them "
                         "with run_metrics_classif.py --label-suffix "
                         "<suffix> [--binarize 0.5]")
    ap.add_argument("--model-class", default="v5", choices=["v5", "v4", "v3"],
                    help="v5 = disentangled M2-info checkpoints (default); "
                    "v4 = flat-tree CVAE_v4 (training_M2_info_vad.py "
                    "--model-variant v4); v3 = bare CVAE_v3 (e.g. from "
                    "training_M2v3_semisup.py). All share the MCEM_M2v3 "
                    "enhancement semantics (encoder on x, decoder on [z;y])")
    ap.add_argument("--output-dir", default=None)
    add_ablation(ap)
    add_std_norm_eval(ap)
    add_shard(ap)
    args = ap.parse_args()
    if args.y_source == "classifier" and not args.classifier_dir:
        ap.error("--y-source classifier requires --classifier-dir")
    if args.labels != "vad_labels":
        # the disentangled model is y_dim=1 (VAD); IBM label h5s would feed
        # (n, 513) labels into it after the ~minutes-long cold compile
        ap.error("the M2-info model is VAD-conditioned; use --labels vad_labels")
    maybe_force_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.enhance.evaluate import (clean_audio_rel, evaluate_sweep,
                                           find_classifier_labels,
                                           load_oracle_labels, shard_slice)
    from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
    from dvae_tpu.models import CVAE_v3, CVAE_v4, DisentangledVAE, init_params
    from dvae_tpu.train import checkpoint as ckpt

    model_cls = {"v5": DisentangledVAE, "v4": CVAE_v4,
                 "v3": CVAE_v3}[args.model_class]
    model = model_cls(x_dim=513, y_dim=1, z_dim=args.z_dim, h_dim=tuple(args.h_dim))
    params_t = init_params(
        model, {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.ones((4, 513)), jnp.ones((4, 1)))
    path = args.checkpoint or ckpt.best_checkpoint(args.model_dir)
    params = ckpt.load_checkpoint(path, params_t)
    print(f"loaded {path}")

    proc = processed_dir(args)

    classify_method = {"v5": "classify_from_x", "v4": "classify_from_x",
                       "v3": "classify"}[args.model_class]
    norm = norm_stats_if(args)

    def self_soft_labels(clean_rel):
        # the model's own x->y classifier on the CLEAN power spectrogram
        # (reference evaluate_ntcd_M2_info_vad.py:174-176), soft
        # probabilities. ops.stft directly (not eval.reconstruct.power_spec,
        # which pulls viz/matplotlib into an enhancement-only run)
        from dvae_tpu.data.io import read_wav
        from dvae_tpu.ops.stft import StftConfig, stft

        s_t, _ = read_wav(os.path.join(proc, clean_audio_rel(clean_rel, args.labels)))
        s2 = jnp.abs(stft(jnp.asarray(s_t, jnp.float32), StftConfig())) ** 2
        if norm is not None:
            # --std-norm: the classifier trained on normalized inputs
            # (train/steps._normalizer) — feed it the same distribution
            mean, std = (jnp.asarray(a, jnp.float32).reshape(-1) for a in norm)
            s2 = (s2 - mean) / (std + 1e-8)
        y = model.apply(params, s2, method=classify_method)
        return np.asarray(y, dtype=np.float32).reshape(-1, 1)

    def y_loader(noisy_rel, clean_rel):
        if args.y_source == "oracle":
            return load_oracle_labels(os.path.join(proc, clean_rel))
        if args.y_source == "classifier":
            base = os.path.splitext(os.path.basename(noisy_rel))[0]
            spk = noisy_rel.split("/")[-2]
            # rel_dir: prefer labels predicted from THIS noise/SNR condition
            # (predict_vad_labels --source noisy mirrors the noisy tree)
            return find_classifier_labels(args.classifier_dir, spk, base, 1,
                                          rel_dir=os.path.dirname(noisy_rel))
        if args.y_source == "self-soft":
            return self_soft_labels(clean_rel)
        n = load_oracle_labels(os.path.join(proc, clean_rel)).shape[0]
        return np.full((n, 1), 1.0 if args.y_source == "ones" else 0.0, dtype=np.float32)

    suffix = {"oracle": "_oracle_y", "classifier": "_y_hat_hard",
              "ones": "_oracle_1", "zeros": "_oracle_0",
              "self-soft": "_y_hat_soft"}[args.y_source]

    # the Enhancer only touches encode/decode; DisentangledVAE exposes the
    # enc_dec_clf submodules through those methods (MCEM_M2v3 semantics)
    from _lib import warn_peem_family

    warn_peem_family(args, args.model_class)
    enh = Enhancer(model, params, EnhancerConfig(
        mcem=mcem_config_of(args), y_mode="dec_only",
        ablation=ablation_of(args), norm=norm, engine=args.engine),
        mesh=make_mesh_if(args))
    out_dir = default_out_dir(args, path)

    if args.save_labels:
        # persist the labels MCEM is conditioned on, next to the enhanced
        # wavs (the reference's commented torch.save lines,
        # evaluate_ntcd_M2_info_vad.py:253-254) — .npy here, which
        # run_metrics_classif.py consumes via --label-suffix. A pre-pass
        # over the catalog (not a y_loader hook): resume-by-skip removes
        # already-enhanced utterances from the sweep, and the label dump
        # must cover those too. Idempotent like the sweep itself.
        from dvae_tpu.data.catalog import ntcd_timit

        pairs = ntcd_timit.proc_noisy_clean_pair_dict(
            proc + "/", "test", args.dataset_size, args.labels, True)
        items = [it for it in pairs.items()
                 if args.snr == "all" or it[0].split("/")[-4] == str(args.snr)]
        # same shard slice as the sweep: each machine dumps only its own
        # chunk's labels (no duplicated work / cross-machine write races)
        items = shard_slice(items, shard_of(args))
        n_saved = 0
        for noisy_rel, clean_rel in items:
            dest = os.path.join(
                out_dir, os.path.splitext(noisy_rel)[0] + suffix + ".npy")
            if os.path.exists(dest):
                continue
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            np.save(dest, y_loader(noisy_rel, clean_rel))
            n_saved += 1
        print(f"saved {n_saved} label files ({suffix}.npy) under {out_dir}")

    n = evaluate_sweep(
        enh, proc, out_dir, dataset_size=args.dataset_size, labels=args.labels,
        snr_filter=None if args.snr == "all" else args.snr,
        batch_size=args.batch_size, shard=shard_of(args), y_loader=y_loader, suffix=suffix)
    print(f"done: {n} utterances -> {out_dir}")


if __name__ == "__main__":
    main()
