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


def make_lstm_vad_step(model, tx: optax.GradientTransformation, eps: float = 1e-8,
                       norm=None) -> Callable:
    """jitted ``step(state, x (B,T,F), y (B,T), mask (B,T)) -> (state, metrics)``.

    ``norm``: optional (mean, std) train statistics of the noisy log-power
    spectrogram — the reference's std_norm=True default for this script
    (train_audio_net.py:72,163-167,221-224): the LSTM sees
    (x - mean)/(std + eps); labels/masks are unaffected. Padded frames
    normalize to (0-mean)/(std+eps) but every reduction is masked."""
    normalize = _normalizer(norm, eps)

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
    ``norm`` as in :func:`make_lstm_vad_step`."""
    normalize = _normalizer(norm, eps)

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
    180-189). ``norm`` as in :func:`make_lstm_vad_step`."""
    normalize = _normalizer(norm, eps)

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
