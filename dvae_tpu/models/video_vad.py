"""Visual and audio-visual voice-activity classifiers (lip-ROI video).

The VAD labels the reference consumes at test time (``*_y_hat_hard.pt``,
evaluate_ntcd_M2.py:85,180-189) were produced by a VIDEO classifier living
in its sibling audio-visual-vad repo (reference README.md:6; the reference's
own train_audio_net.py even names its checkpoints ``Video_Net_epoch_*``,
train_audio_net.py:368-371, and imports a ``VideoClassifier`` it commented
out, train_audio_net.py:14). A reference user cannot regenerate those labels
from the repo alone. These modules supply in-framework producers:

* :class:`VideoVad` — 62.5 fps upsampled 67x67 lip-ROI frames (the
  ``create_video_train_files.py`` output contract) -> per-frame speech
  probability;
* :class:`AVVad` — the audio-visual fusion: noisy log-power spectrogram
  frames concatenated with the lip embedding, matching the data the
  reference's ``AudioVisualSequenceLabeledFrames`` loader assembles
  (data_handling.py:225-330) but never gets to train on in-repo.

TPU notes: the per-frame lip encoder runs as ONE batched conv stack over all
(B*T) frames — strided 3x3 convs that XLA tiles onto the MXU — followed by
the same fused-gate LSTM recurrence as the audio net (``flax.linen.RNN`` =
``lax.scan`` with an OptimizedLSTMCell). Padded frames flow through the
network; every loss/metric reduction downstream is length-masked
(train/sequence.py), so they never score.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from dvae_tpu.models.blocks import dense


class LipEncoder(nn.Module):
    """Per-frame 67x67 lip-ROI -> embedding, batched over all frames.

    Three stride-2 3x3 convs (67 -> 34 -> 17 -> 9 spatial) then a tanh
    projection. Inputs are expected normalized ((v - mean)/(std + eps) with
    the pixel statistics h5 the video builder writes — callers thread this
    through the sequence trainer's ``norm``)."""

    emb_dim: int = 128
    conv_features: Sequence[int] = (8, 16, 32)

    @nn.compact
    def __call__(self, v):
        """v: (batch, time, 67, 67) -> (batch, time, emb_dim)."""
        b, t = v.shape[:2]
        h = v.reshape(b * t, *v.shape[2:], 1)
        for i, f in enumerate(self.conv_features):
            h = nn.relu(nn.Conv(f, (3, 3), strides=(2, 2),
                                name=f"conv_{i}")(h))
        h = h.reshape(b, t, -1)
        return nn.tanh(dense(self.emb_dim, name="proj")(h))


class VideoVad(nn.Module):
    """Video-only frame VAD: lip encoder + stacked LSTM + sigmoid head.

    The in-framework equivalent of the sibling repo's video classifier whose
    outputs the reference consumed (evaluate_ntcd_M2.py:180-189)."""

    hidden: int = 512
    num_layers: int = 2
    emb_dim: int = 128
    conv_features: Sequence[int] = (8, 16, 32)

    @nn.compact
    def __call__(self, v):
        """v: (batch, time, 67, 67) -> per-frame VAD probability (batch, time)."""
        h = LipEncoder(self.emb_dim, self.conv_features, name="lip")(v)
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.hidden, name=f"lstm_{i}")
            h = nn.RNN(cell, name=f"rnn_{i}")(h)
        logits = dense(1, name="head")(h)[..., 0]
        return nn.sigmoid(logits)


class AVVad(nn.Module):
    """Audio-visual frame VAD: [log-power spectrogram ; lip embedding] -> LSTM.

    Consumes exactly what the reference's AV loader assembles per utterance
    (noisy log-power frames + upsampled video + labels, trimmed to the
    common frame count — data_handling.py:225-330)."""

    x_dim: int = 513
    hidden: int = 512
    num_layers: int = 2
    emb_dim: int = 128
    conv_features: Sequence[int] = (8, 16, 32)

    @nn.compact
    def __call__(self, xs):
        """xs = (audio (batch, time, x_dim), video (batch, time, 67, 67))
        -> per-frame VAD probability (batch, time)."""
        a, v = xs
        h = jnp.concatenate(
            [a, LipEncoder(self.emb_dim, self.conv_features, name="lip")(v)],
            axis=-1)
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.hidden, name=f"lstm_{i}")
            h = nn.RNN(cell, name=f"rnn_{i}")(h)
        logits = dense(1, name="head")(h)[..., 0]
        return nn.sigmoid(logits)
