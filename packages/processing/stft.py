"""Reference-signature STFT/ISTFT (compat shim over dvae_tpu.ops.stft).

Matches /root/reference/packages/processing/stft.py:13-100: same parameter
names and DEFAULTS (50 ms window, center=True — the reference's production
calls override to 64 ms/center=False per call site), frequency-major
``(n_bins, n_frames)`` returns, numpy in/out. The ``*_pytorch`` variants
raise with guidance (they exist only to feed the reference's torch
loaders; dvae-tpu's loaders compute spectrograms on-device)."""

from __future__ import annotations

import importlib

import numpy as np

# dvae_tpu.ops re-exports a `stft` FUNCTION that shadows the submodule name
_ops = importlib.import_module("dvae_tpu.ops.stft")


def _cfg(fs, wlen_sec, win, hop_percent, center, pad_mode="reflect",
         pad_at_end=True):
    if wlen_sec * fs != int(wlen_sec * fs):
        raise ValueError("wlen_sample of STFT is not an integer.")
    return _ops.StftConfig(fs=int(fs), wlen_sec=wlen_sec, window=win,
                           hop_percent=hop_percent, center=center,
                           pad_mode=pad_mode, pad_at_end=pad_at_end)


def stft(x, fs=16e3, wlen_sec=50e-3, win="hann", hop_percent=0.25,
         center=True, pad_mode="reflect", pad_at_end=True,
         dtype="complex64"):
    """(n_bins, n_frames) complex spectrogram of a 1-D signal."""
    cfg = _cfg(fs, wlen_sec, win, hop_percent, center, pad_mode, pad_at_end)
    # stft_to_host: two float reads (complex cannot cross the axon tunnel)
    S = _ops.stft_to_host(np.asarray(x, np.float32), cfg)
    return S.T.astype(dtype)


def istft(Sxx, fs=16000, wlen_sec=50e-3, win="hann", hop_percent=0.25,
          center=True, dtype="float32", max_len=None):
    """Inverse of :func:`stft`; ``max_len`` truncates/zero-pads like the
    reference (its stft.py:97-98 via librosa ``length``)."""
    cfg = _cfg(fs, wlen_sec, win, hop_percent, center)
    x = _ops.istft_np(np.asarray(Sxx).T, cfg, length=max_len)
    return x.astype(dtype)


def stft_pytorch(*a, **k):
    raise NotImplementedError(
        "stft_pytorch fed the reference's torch data loaders; dvae-tpu's "
        "loaders compute spectrograms on-device (dvae_tpu.ops.stft with "
        "StftConfig(center=True) is the same math). See MIGRATING.md.")


def istft_pytorch(*a, **k):
    raise NotImplementedError(
        "istft_pytorch has no consumer here; use packages.processing.stft."
        "istft (numpy) or dvae_tpu.ops.stft.istft_np. See MIGRATING.md.")
