"""Audio LSTM voice-activity classifier.

The reference's ``scripts/train_audio_net.py`` imports
``packages.models.Audio_Net.DeepVAD_audio`` (train_audio_net.py:18) which is
missing from its tree; per its config (2-layer LSTM, hidden 1024,
train_audio_net.py:69-70) this module supplies a real implementation: a
stacked LSTM over per-frame log-power-spectrogram features with a sigmoid
frame-VAD head. The module itself runs over ALL frames (padding included);
length masking for padded batches lives downstream, in the mask-weighted
BCE / ``losses.f1_loss(mask=...)`` that the sequence trainer threads
(train/sequence.py) — outputs at padded frames must never enter an
unmasked reduction.

TPU notes: the recurrence uses ``flax.linen.RNN`` (an ``lax.scan`` under the
hood) with an OptimizedLSTMCell — gates are fused 8xH matmuls on the MXU.
"""

from __future__ import annotations

import flax.linen as nn

from dvae_tpu.models.blocks import dense


class LSTMVad(nn.Module):
    x_dim: int = 513
    hidden: int = 1024
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        """x: (batch, time, x_dim) -> per-frame VAD probability (batch, time)."""
        h = x
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.hidden, name=f"lstm_{i}")
            h = nn.RNN(cell, name=f"rnn_{i}")(h)
        logits = dense(1, name="head")(h)[..., 0]
        return nn.sigmoid(logits)
