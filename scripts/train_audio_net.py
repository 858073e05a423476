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
    if args.labels != "vad_labels":
        # the LSTM head emits one scalar per frame; a 513-dim IBM label
        # would silently flatten into garbage in batch_utterances (the
        # reference's script is VAD-only too, train_audio_net.py:63-66)
        ap.error("train_audio_net is VAD-only (--labels vad_labels)")
    maybe_force_platform(args)

    import jax

    from dvae_tpu.data.catalog import ntcd_timit
    from dvae_tpu.data.datasets import UtteranceDataset
    from dvae_tpu.models import LSTMVad
    from dvae_tpu.ops.stft import StftConfig
    from dvae_tpu.train.sequence import (
        batch_utterances, fit_sequence, make_lstm_vad_eval, make_lstm_vad_step,
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

    model_dir = os.path.join(
        args.models_root,
        args.run_name or (f"ntcd_audio_vad_lstm_{args.hidden}x{args.num_layers}"
                          + ("_norm" if args.std_norm else "")))
    # the one reference script with multi-device training (DataParallel over
    # 4 GPUs, train_audio_net.py:150): fit_sequence shards the sequence
    # batch over the data mesh, params replicated (zero-pad rows fully
    # masked — exact for the masked BCE/F1)
    fit_sequence(
        state, step, evaluate, train_ds, valid_ds,
        lambda ds, idx: batch_utterances(ds, idx, stft_cfg),
        model_dir, prefix="VAD", seed=args.seed,
        start_epoch=args.start_epoch, end_epoch=args.end_epoch,
        batch_size=args.seq_batch_size, mesh=make_mesh_if(args))


if __name__ == "__main__":
    main()
