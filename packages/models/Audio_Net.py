"""Guidance shim for the reference's MISSING ``Audio_Net`` dependency.

The reference's ``train_audio_net.py:18`` does
``from packages.models.Audio_Net import DeepVAD_audio`` but ships no such
module — the LSTM VAD classifier lived in the sibling audio-visual-vad
repo, so the script is unrunnable from the reference checkout (SURVEY
§2.2 #20). This module exists so that import resolves to a pointed error
naming the working native equivalents instead of an ImportError:

* model: :class:`dvae_tpu.models.lstm_vad.LSTMVad` (audio),
  :class:`dvae_tpu.models.video_vad.VideoVad` / ``AVVad`` (video / AV);
* trainer: ``scripts/train_audio_net.py`` / ``scripts/train_video_net.py``;
* label producer: ``scripts/predict_vad_labels.py``.
"""

from __future__ import annotations


def __getattr__(name):
    if name in ("DeepVAD_audio", "DeepVAD_video", "DeepVAD_av"):
        raise NotImplementedError(
            f"packages.models.Audio_Net.{name} never existed in the "
            "reference (train_audio_net.py:18 imports it from the sibling "
            "audio-visual-vad repo). The working equivalents here are "
            "dvae_tpu.models.lstm_vad.LSTMVad / video_vad.{VideoVad,AVVad} "
            "with scripts/train_audio_net.py, train_video_net.py and "
            "predict_vad_labels.py. See MIGRATING.md.")
    raise AttributeError(
        f"module 'packages.models.Audio_Net' has no attribute {name!r}")
