"""Sequence-model training: the LSTM voice-activity classifier.

The reference's train_audio_net.py is broken in-repo (missing Audio_Net and
collate imports, train_audio_net.py:18-20); this module supplies the working
equivalent: whole-utterance batches of noisy log-power spectrograms, padded
to a common length, per-frame BCE masked by true length
(train_audio_net.py:231-234 semantics), per-epoch F1 statistics, and an
Adam/optax loop. Batches shard over a ``data`` mesh axis (the TPU-native
replacement for the reference's 4-GPU nn.DataParallel,
train_audio_net.py:150).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dvae_tpu.models.losses import f1_loss
from dvae_tpu.ops import log_power_spectrogram
from dvae_tpu.ops.stft import StftConfig
from dvae_tpu.train.steps import TrainState, _normalizer


def _seq_normalizer(norm, eps):
    """``steps._normalizer`` extended to tuple inputs (the AV classifier).

    ``norm`` may be None, one (mean, std) pair for a plain array input, or a
    tuple of per-component pairs/Nones matching a tuple input — e.g.
    ``((audio_mean, audio_std), (pixel_mean, pixel_std))`` for
    :class:`~dvae_tpu.models.video_vad.AVVad`'s (audio, video) pair."""
    if (norm is not None and isinstance(norm, tuple)
            and all(n is None or isinstance(n, tuple) for n in norm)):
        fns = [_normalizer(n, eps) for n in norm]
        return lambda xs: tuple(f(x) for f, x in zip(fns, xs, strict=True))
    return _normalizer(norm, eps)


def make_lstm_vad_step(model, tx: optax.GradientTransformation, eps: float = 1e-8,
                       norm=None) -> Callable:
    """jitted ``step(state, x (B,T,F), y (B,T), mask (B,T)) -> (state, metrics)``.

    ``x`` may be a tuple of arrays for multi-input models (the AV
    classifier); ``norm`` then takes the tuple form of
    :func:`_seq_normalizer`. For the audio net, ``norm`` is the optional
    (mean, std) train statistics of the noisy log-power spectrogram — the
    reference's std_norm=True default for this script
    (train_audio_net.py:72,163-167,221-224): the LSTM sees
    (x - mean)/(std + eps); labels/masks are unaffected. Padded frames
    normalize to (0-mean)/(std+eps) but every reduction is masked."""
    normalize = _seq_normalizer(norm, eps)

    def loss_fn(params, x, y, mask):
        p = model.apply(params, normalize(x))  # (B, T)
        bce = -(y * jnp.log(p + eps) + (1 - y) * jnp.log(1 - p + eps))
        loss = jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return loss, p

    @jax.jit
    def step(state: TrainState, x, y, mask):
        (loss, p), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x, y, mask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        hard = (p > 0.5).astype(jnp.float32) * mask
        # mask excludes padded frames from the counts (not just zeroes
        # them): unmasked they would all score as true negatives and
        # inflate accuracy relative to the reference's per-length slicing
        acc, prec, rec, f1 = f1_loss(hard, y * mask, mask=mask)
        return TrainState(params, opt_state, state.step + 1), {
            "bce": loss, "accuracy": acc, "precision": prec, "recall": rec, "f1": f1}

    return step


def make_lstm_vad_eval(model, eps: float = 1e-8, norm=None) -> Callable:
    """jitted ``evaluate(params, x, y, mask) -> metrics`` (no update) — the
    validation pass of the reference loop (train_audio_net.py:276-289).
    ``norm``/tuple inputs as in :func:`make_lstm_vad_step`."""
    normalize = _seq_normalizer(norm, eps)

    @jax.jit
    def evaluate(params, x, y, mask):
        p = model.apply(params, normalize(x))
        bce = -(y * jnp.log(p + eps) + (1 - y) * jnp.log(1 - p + eps))
        loss = jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        hard = (p > 0.5).astype(jnp.float32) * mask
        acc, prec, rec, f1 = f1_loss(hard, y * mask, mask=mask)
        return {"bce": loss, "accuracy": acc, "precision": prec,
                "recall": rec, "f1": f1}

    return evaluate


def make_lstm_vad_predict(model, eps: float = 1e-8, norm=None) -> Callable:
    """jitted ``predict(params, x (B,T,F)) -> p (B,T)`` frame-VAD posterior.

    The inference counterpart of :func:`make_lstm_vad_eval` — no labels, no
    metrics; feeds scripts/predict_vad_labels.py, the in-framework producer
    of the ``*_y_hat_hard`` classifier outputs the reference consumed from
    its sibling audio-visual-vad repo (reference evaluate_ntcd_M2.py:85,
    180-189). ``norm``/tuple inputs as in :func:`make_lstm_vad_step`."""
    normalize = _seq_normalizer(norm, eps)

    @jax.jit
    def predict(params, x):
        return model.apply(params, normalize(x))

    return predict


def batch_utterances(ds, indices, stft_cfg: StftConfig, pad_to_multiple: int = 64):
    """Assemble (x (B,T,F) log-power, y (B,T), mask (B,T)) from an
    UtteranceDataset; the spectrogram is computed on-device."""
    wavs, labels = [], []
    for i in indices:
        w, y = ds[i]
        wavs.append(w)
        labels.append(np.asarray(y).reshape(-1))
    from dvae_tpu.ops.stft import n_stft_frames_clamped, samples_for_frames

    # outer max: labels trimmed to zero frames still occupy one (masked) row
    frames = [max(1, min(n_stft_frames_clamped(len(w), stft_cfg), len(l)))
              for w, l in zip(wavs, labels)]
    n_max = -(-max(frames) // pad_to_multiple) * pad_to_multiple
    t_pad = samples_for_frames(n_max, stft_cfg)

    xb = np.zeros((len(indices), t_pad), np.float32)
    yb = np.zeros((len(indices), n_max), np.float32)
    mb = np.zeros((len(indices), n_max), np.float32)
    for j, (w, l, n) in enumerate(zip(wavs, labels, frames)):
        # a wav can be LONGER than t_pad when its labels trim the frame
        # count below what its sample count implies (video-trim semantics,
        # cf. pipeline._prepare): the excess samples are unused anyway
        t_use = min(len(w), t_pad)
        xb[j, :t_use] = w[:t_use]
        # a zero-length label vector leaves its (1-frame placeholder) row
        # fully MASKED — n is clamped to >=1 for the shape, but only frames
        # that really carry labels may score
        n_lab = min(n, len(l))
        yb[j, :n_lab] = l[:n_lab]
        mb[j, :n_lab] = 1.0

    spec = log_power_spectrogram(jnp.asarray(xb), stft_cfg)[:, :n_max]
    return spec, jnp.asarray(yb), jnp.asarray(mb)


def batch_video_utterances(ds, indices, pad_to_multiple: int = 64):
    """Assemble (v (B,T,67,67), y (B,T), mask (B,T)) from a
    :class:`~dvae_tpu.data.av_dataset.VideoDataset` — zero-padded to a
    bucketed common length so the jit cache is keyed by the T bucket, like
    :func:`batch_utterances`."""
    vids, labels = [], []
    for i in indices:
        v, y = ds[i]
        vids.append(np.asarray(v, np.float32))
        labels.append(np.asarray(y, np.float32).reshape(-1))
    frames = [max(1, min(len(v), len(l))) for v, l in zip(vids, labels)]
    n_max = -(-max(frames) // pad_to_multiple) * pad_to_multiple
    vb = np.zeros((len(vids), n_max) + vids[0].shape[1:], np.float32)
    yb = np.zeros((len(vids), n_max), np.float32)
    mb = np.zeros((len(vids), n_max), np.float32)
    for j, (v, l, n) in enumerate(zip(vids, labels, frames)):
        n_lab = min(n, len(l), len(v))
        vb[j, :n_lab] = v[:n_lab]
        yb[j, :n_lab] = l[:n_lab]
        mb[j, :n_lab] = 1.0
    return jnp.asarray(vb), jnp.asarray(yb), jnp.asarray(mb)


def batch_av_utterances(ds, indices, stft_cfg: StftConfig,
                        pad_to_multiple: int = 64):
    """Assemble ((spec (B,T,F), v (B,T,67,67)), y, mask) from an
    :class:`~dvae_tpu.data.av_dataset.AudioVisualDataset` — the multi-input
    batch for :class:`~dvae_tpu.models.video_vad.AVVad`. The spectrogram is
    computed on-device; video/labels zero-pad to the bucketed length."""
    wavs, vids, labels = [], [], []
    for i in indices:
        w, v, y = ds[i]
        if y is None:
            raise ValueError("AV training batches need labeled triples")
        wavs.append(w)
        vids.append(np.asarray(v, np.float32))
        labels.append(np.asarray(y, np.float32).reshape(-1))
    from dvae_tpu.ops.stft import n_stft_frames_clamped, samples_for_frames

    # the dataset already trimmed video/labels to the common frame count;
    # clamp to the audio frames too (exact count depends on the STFT flags)
    frames = [max(1, min(n_stft_frames_clamped(len(w), stft_cfg),
                         len(v), len(l)))
              for w, v, l in zip(wavs, vids, labels)]
    n_max = -(-max(frames) // pad_to_multiple) * pad_to_multiple
    t_pad = samples_for_frames(n_max, stft_cfg)

    xb = np.zeros((len(wavs), t_pad), np.float32)
    vb = np.zeros((len(wavs), n_max) + vids[0].shape[1:], np.float32)
    yb = np.zeros((len(wavs), n_max), np.float32)
    mb = np.zeros((len(wavs), n_max), np.float32)
    for j, (w, v, l, n) in enumerate(zip(wavs, vids, labels, frames)):
        t_use = min(len(w), t_pad)
        xb[j, :t_use] = w[:t_use]
        vb[j, :n] = v[:n]
        yb[j, :n] = l[:n]
        mb[j, :n] = 1.0
    spec = log_power_spectrogram(jnp.asarray(xb), stft_cfg)[:, :n_max]
    return (spec, jnp.asarray(vb)), jnp.asarray(yb), jnp.asarray(mb)


def fit_sequence(state, step, evaluate, train_ds, valid_ds, batcher,
                 model_dir, *, prefix: str, seed: int = 0,
                 start_epoch: int = 1, end_epoch: int = 500,
                 batch_size: int = 16, mesh=None, log=print):
    """Shared epoch driver for the sequence classifiers (audio / video / AV).

    One home for the loop machinery ``scripts/train_audio_net.py`` and
    ``scripts/train_video_net.py`` would otherwise duplicate: per-epoch
    (seed, epoch) shuffle streams (bitwise-faithful resume, cf.
    train/loop.py), mesh sharding with fully-masked zero-pad rows,
    optimizer-state resume, validation, vloss-named checkpoints with the
    process-0 write guard. ``batcher(ds, indices) -> (x, y, mask)`` where
    ``x`` may be a tuple (the AV model). Returns the final state."""
    import jax

    from dvae_tpu.train import checkpoint as ckpt
    from dvae_tpu.train.loop import _resume_checkpoint

    if mesh is not None:
        from dvae_tpu.parallel import replicate

        state = replicate(state, mesh)

    def maybe_shard(batch):
        if mesh is None:
            return batch
        from dvae_tpu.parallel import distribute_batch

        # zero rows are fully MASKED — exact for the masked BCE/F1 (mask=0
        # rows enter no reduction), so EVERY step runs sharded and the
        # TrainState keeps its mesh sharding (cf. loop.py's _pad_shardable)
        pad = (-batch[-1].shape[0]) % mesh.devices.size
        if pad:
            batch = jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0),
                batch)
        return distribute_batch(batch, mesh)

    if start_epoch > 1:
        # restore params AND optimizer state from epoch start_epoch-1;
        # refuse to silently restart from random init (loop.py semantics)
        resume = _resume_checkpoint(model_dir, prefix, start_epoch)
        params, opt_state = ckpt.load_checkpoint(
            resume, state.params, state.opt_state)
        state = state._replace(params=params, opt_state=opt_state)
        if mesh is not None:
            from dvae_tpu.parallel import replicate

            state = replicate(state, mesh)
        log(f"resumed from {resume}")

    for epoch in range(start_epoch, end_epoch):
        # per-epoch shuffle stream, pure function of (seed, epoch): a
        # resumed run replays the uninterrupted run's orders (cf. loop.py)
        rng = np.random.default_rng((seed, epoch))
        order = rng.permutation(len(train_ds))
        totals, n_batches = {}, 0
        for s in range(0, len(order), batch_size):
            xb, yb, mb = maybe_shard(batcher(train_ds, order[s:s + batch_size]))
            state, m = step(state, xb, yb, mb)
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n_batches += 1
        avg = {k: v / n_batches for k, v in totals.items()}
        log(f"epoch {epoch}: " + "  ".join(f"{k}={v:.4f}" for k, v in avg.items()))

        # validation pass (reference train_audio_net.py:276-289); the vloss
        # in the checkpoint name is VALIDATION BCE, not training BCE
        vt, vn = {}, 0
        for s0 in range(0, len(valid_ds), batch_size):
            xb, yb, mb = maybe_shard(batcher(
                valid_ds, range(s0, min(s0 + batch_size, len(valid_ds)))))
            m = evaluate(state.params, xb, yb, mb)
            for k, v in m.items():
                vt[k] = vt.get(k, 0.0) + float(v)
            vn += 1
        vavg = {k: v / max(vn, 1) for k, v in vt.items()}
        log("  valid: " + "  ".join(f"{k}={v:.4f}" for k, v in vavg.items()))
        name = ckpt.checkpoint_name(prefix, epoch, vavg.get("bce", avg["bce"]))
        if jax.process_index() == 0:  # multi-host: one writer to shared dir
            ckpt.save_checkpoint(model_dir, name, state.params,
                                 opt_state=state.opt_state,
                                 metadata={"epoch": epoch, **avg,
                                           **{f"valid_{k}": v for k, v in vavg.items()}})
    return state
