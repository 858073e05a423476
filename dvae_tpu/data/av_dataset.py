"""Audio-visual sequence dataset: noisy audio + upsampled lip-ROI video + labels.

Mirrors the reference's ``AudioVisualSequenceLabeledFrames`` and
``AudioVisualSequenceWavLabeledFrames`` (data_handling.py:225-404): per
utterance, the noisy waveform (peak-normalized, data_handling.py:123-ish),
the 62.5 fps upsampled lip video from ``<utt>_upsampled.h5`` (``X``
(67, 67, n_frames)), and per-frame labels from the label h5 — all trimmed to
the common frame count (data_handling.py:321-324). The reference returned
either a log-power spectrogram or the raw waveform; here the raw waveform is
returned and the spectrogram is computed on device by the training step
(dvae_tpu.train.sequence / ops.log_power_spectrogram), which is both the
TPU-idiomatic split and strictly more information.
"""

from __future__ import annotations

import pathlib

import h5py
import numpy as np

from dvae_tpu.data.io import read_wav


class VideoDataset:
    """Per-utterance (video (N, 67, 67), labels (N,)) pairs — the video-only
    VAD training set (models/video_vad.VideoVad). ``pairs`` is a list of
    (video_h5_path, label_h5_path); video and labels are trimmed to the
    common frame count like the AV loader (reference data_handling.py:321-324)."""

    def __init__(self, pairs):
        self.pairs = [(pathlib.Path(v), pathlib.Path(l)) for v, l in pairs]

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i):
        video_path, label_path = self.pairs[i]
        with h5py.File(video_path, "r") as f:
            v = f["X"][:]  # (67, 67, n_frames)
        v = np.ascontiguousarray(np.moveaxis(v, -1, 0), dtype=np.float32)
        with h5py.File(label_path, "r") as f:
            y = f["Y"][:]  # (y_dim, n_frames)
        y = np.ascontiguousarray(y.T, dtype=np.float32)
        n = min(v.shape[0], y.shape[0])
        return v[:n], y[:n]


class AudioVisualDataset:
    """Per-utterance (waveform, video (N, 67, 67), labels (N, y_dim)) triples.

    ``triples`` is a list of (wav_path, video_h5_path, label_h5_path|None).
    """

    def __init__(self, triples, fs: int = 16000, peak_normalize: bool = True,
                 hop: int = 256, nfft: int = 1024):
        self.triples = [
            (pathlib.Path(w), pathlib.Path(v), pathlib.Path(l) if l else None)
            for w, v, l in triples
        ]
        self.fs = fs
        self.peak_normalize = peak_normalize
        self.hop = hop
        self.nfft = nfft

    def __len__(self):
        return len(self.triples)

    def __getitem__(self, i):
        wav_path, video_path, label_path = self.triples[i]
        x, fs = read_wav(wav_path)
        if fs != self.fs:
            raise ValueError(f"{wav_path}: fs={fs}, expected {self.fs}")
        if self.peak_normalize:
            peak = np.max(np.abs(x))
            if peak > 0:
                x = x / peak
        with h5py.File(video_path, "r") as f:
            v = f["X"][:]  # (67, 67, n_frames)
        v = np.ascontiguousarray(np.moveaxis(v, -1, 0), dtype=np.float32)
        y = None
        if label_path is not None:
            with h5py.File(label_path, "r") as f:
                y = f["Y"][:]  # (y_dim, n_frames)
            y = np.ascontiguousarray(y.T, dtype=np.float32)

        # trim video/labels to the common frame count (data_handling.py:321-324)
        n_audio = 1 + max(0, (len(x) - self.nfft)) // self.hop
        n = min(v.shape[0], n_audio, *(() if y is None else (y.shape[0],)))
        v = v[:n]
        if y is not None:
            y = y[:n]
        # The waveform is returned in full (padded up to the n-frame minimum
        # if short). Exact frame counts depend on the consumer's STFT flags
        # (center, the end-padding float rule adds a frame for ~10% of
        # lengths), so consumers slice/mask spectrogram frames to the label
        # length — exactly what train.sequence.batch_utterances does.
        t_min = (n - 1) * self.hop + self.nfft
        if len(x) < t_min:
            x = np.pad(x, (0, t_min - len(x)))
        return x.astype(np.float32), v, y
