#!/usr/bin/env python
"""Train the audio LSTM voice-activity classifier on noisy whole sequences.

Working replacement for /root/reference/scripts/train_audio_net.py (whose
imports are broken in-repo): 2-layer LSTM (hidden 1024) over noisy log-power
spectrogram frames, length-masked per-frame BCE, per-epoch F1, checkpoints
per epoch. The 4-GPU nn.DataParallel becomes a ``data`` mesh shard."""

import argparse
import os

from _lib import add_common, make_mesh_if, maybe_force_platform, processed_dir


def main():
    # NOT add_common(training=True): the sequence loop has its own batch knob
    # (--seq-batch-size) and no frame-level z/h dims — exposing the frame-MLP
    # training flags here would be accepted-and-ignored dead knobs
    ap = add_common(argparse.ArgumentParser(description=__doc__))
    ap.add_argument("--learning-rate", type=float, default=1e-4)
    ap.add_argument("--start-epoch", type=int, default=1)
    ap.add_argument("--end-epoch", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--run-name", default=None,
                    help="override the auto model dir name")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard sequence batches over all visible devices")
    ap.add_argument("--multihost", action="store_true",
                    help="join a multi-process JAX runtime before building "
                         "the mesh; implies --data-parallel")
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--num-layers", type=int, default=2)
    ap.add_argument("--seq-batch-size", type=int, default=16)
    ap.add_argument("--train-split", default="train",
                    help="catalog split for training (the shipped subset only "
                         "has noisy 'test' wavs — use it for smoke runs)")
    ap.add_argument("--valid-split", default="validation")
    ap.add_argument("--std-norm", action="store_true",
                    help="normalize the log-power inputs with the train "
                         "statistics h5 (the reference's std_norm=True "
                         "default for this script, train_audio_net.py:72)")
    ap.add_argument("--stats-h5", default=None,
                    help="statistics h5 for --std-norm; defaults to the "
                         "noisy log-power stats the create_audio_train_set "
                         "builder writes "
                         "(<processed>/ntcd_timit/Noisy/ntcd_timit_log_"
                         "power_spec_upsampled_statistics.h5 — the "
                         "reference's default, train_audio_net.py:101)")
    args = ap.parse_args()
    maybe_force_platform(args)

    import jax
    import numpy as np

    from dvae_tpu.data.catalog import ntcd_timit
    from dvae_tpu.data.datasets import UtteranceDataset
    from dvae_tpu.models import LSTMVad
    from dvae_tpu.ops.stft import StftConfig
    from dvae_tpu.train import checkpoint as ckpt
    from dvae_tpu.train.sequence import (
        batch_utterances, make_lstm_vad_eval, make_lstm_vad_step,
    )
    from dvae_tpu.train.steps import adam, init_train_state

    proc = processed_dir(args)
    stft_cfg = StftConfig(center=True)  # loader parity (data_handling.py:126-139)

    def utterances(split):
        pairs = ntcd_timit.proc_noisy_clean_pair_dict(
            proc + "/", split, args.dataset_size, args.labels, upsampled=True)
        out = []
        for noisy_rel, clean_rel in pairs.items():
            wav = os.path.join(proc, noisy_rel)
            lab = os.path.join(proc, clean_rel)
            if os.path.exists(wav) and os.path.exists(lab):
                out.append((wav, lab))
        return UtteranceDataset(out)

    train_ds, valid_ds = utterances(args.train_split), utterances(args.valid_split)
    if len(train_ds) == 0:
        raise SystemExit("no training utterances found; run the create_* builders")
    print(f"{len(train_ds)} train / {len(valid_ds)} validation utterances")

    norm = None
    if args.std_norm:
        import h5py

        stats = args.stats_h5 or os.path.join(
            proc, "ntcd_timit", "Noisy",
            "ntcd_timit_log_power_spec_upsampled_statistics.h5")
        with h5py.File(stats, "r") as f:
            norm = (f["X_train_mean"][:], f["X_train_std"][:])
        print(f"std-norm from {stats}")

    model = LSTMVad(x_dim=513, hidden=args.hidden, num_layers=args.num_layers)
    xb, yb, mb = batch_utterances(train_ds, range(min(2, len(train_ds))), stft_cfg)
    params = model.init({"params": jax.random.PRNGKey(args.seed)}, xb)
    tx = adam(args.learning_rate)
    state = init_train_state(model, params, tx)
    step = make_lstm_vad_step(model, tx, norm=norm)
    evaluate = make_lstm_vad_eval(model, norm=norm)

    # the one reference script with multi-device training (DataParallel over
    # 4 GPUs, train_audio_net.py:150): here the sequence batch shards over
    # the data mesh, params replicated. Non-divisible trailing batches are
    # ZERO-padded with fully-masked rows — exact for the masked BCE/F1
    # (mask=0 rows enter no reduction), so EVERY training step runs sharded
    # and the TrainState keeps its mesh sharding (an unsharded fallback
    # would strip it and, under --multihost, mix host-local arrays into a
    # global-mesh program — cf. loop.py's _pad_shardable for the frame
    # trainers, where wrap-padding plays the same role)
    mesh = make_mesh_if(args)
    if mesh is not None:
        from dvae_tpu.parallel import replicate

        state = replicate(state, mesh)

    def maybe_shard(batch):
        if mesh is None:
            return batch
        import jax.numpy as jnp

        from dvae_tpu.parallel import distribute_batch

        pad = (-batch[0].shape[0]) % mesh.devices.size
        if pad:
            batch = tuple(
                jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
                )
                for a in batch
            )
        return distribute_batch(batch, mesh)

    model_dir = os.path.join(
        args.models_root,
        args.run_name or (f"ntcd_audio_vad_lstm_{args.hidden}x{args.num_layers}"
                          + ("_norm" if args.std_norm else "")))
    if args.start_epoch > 1:
        # resume like the VAE trainers (train/loop.py): restore params AND
        # optimizer state from the epoch-(start_epoch-1) checkpoint; refuse
        # to silently restart from random init under a continued epoch count
        from dvae_tpu.train.loop import _resume_checkpoint

        resume = _resume_checkpoint(model_dir, "VAD", args.start_epoch)
        params, opt_state = ckpt.load_checkpoint(
            resume, state.params, state.opt_state)
        state = state._replace(params=params, opt_state=opt_state)
        if mesh is not None:
            from dvae_tpu.parallel import replicate

            state = replicate(state, mesh)
        print(f"resumed from {resume}")
    for epoch in range(args.start_epoch, args.end_epoch):
        # per-epoch shuffle stream, pure function of (seed, epoch): a
        # resumed run replays the uninterrupted run's orders (cf. loop.py)
        rng = np.random.default_rng((args.seed, epoch))
        order = rng.permutation(len(train_ds))
        totals, n_batches = {}, 0
        for s in range(0, len(order), args.seq_batch_size):
            xb, yb, mb = maybe_shard(batch_utterances(
                train_ds, order[s : s + args.seq_batch_size], stft_cfg))
            state, m = step(state, xb, yb, mb)
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n_batches += 1
        avg = {k: v / n_batches for k, v in totals.items()}
        print(f"epoch {epoch}: " + "  ".join(f"{k}={v:.4f}" for k, v in avg.items()))

        # validation pass (reference train_audio_net.py:276-289); the vloss
        # in the checkpoint name is VALIDATION BCE, not training BCE
        vt, vn = {}, 0
        for s0 in range(0, len(valid_ds), args.seq_batch_size):
            xb, yb, mb = maybe_shard(batch_utterances(
                valid_ds, range(s0, min(s0 + args.seq_batch_size, len(valid_ds))),
                stft_cfg))
            m = evaluate(state.params, xb, yb, mb)
            for k, v in m.items():
                vt[k] = vt.get(k, 0.0) + float(v)
            vn += 1
        vavg = {k: v / max(vn, 1) for k, v in vt.items()}
        print(f"  valid: " + "  ".join(f"{k}={v:.4f}" for k, v in vavg.items()))
        name = ckpt.checkpoint_name("VAD", epoch, vavg.get("bce", avg["bce"]))
        if jax.process_index() == 0:  # multi-host: one writer to shared dir
            ckpt.save_checkpoint(model_dir, name, state.params,
                                 opt_state=state.opt_state,
                                 metadata={"epoch": epoch, **avg,
                                           **{f"valid_{k}": v for k, v in vavg.items()}})


if __name__ == "__main__":
    main()
