"""Reference-signature STFT/ISTFT (compat shim over dvae_tpu.ops.stft).

Matches /root/reference/packages/processing/stft.py:13-100: same parameter
names and DEFAULTS (50 ms window, center=True — the reference's production
calls override to 64 ms/center=False per call site), frequency-major
``(n_bins, n_frames)`` returns, numpy in/out.

The ``*_pytorch`` variants (reference stft.py:102-193) are WORKING torch
drop-ins feeding the sequence-dataset shims (``packages.data_handling``):
same pad-at-end quirk, Hann window, ``torch.stft`` semantics, and the
reference-era ``(n_bins, n_frames, 2)`` real/imag layout (modern torch
returns complex; ``view_as_real`` restores the old contract user code
indexes with ``[..., 0]**2 + [..., 1]**2``). Two reference crashes are
fixed rather than replicated: ``pad_at_end=False`` no longer hits an
unbound ``x_`` (stft.py:45-52), and non-Hann windows raise a clear error
instead of an unbound ``window`` NameError (stft.py:141-143)."""

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


def _torch_params(fs, wlen_sec, win, hop_percent):
    import torch

    if wlen_sec * fs != int(wlen_sec * fs):
        raise ValueError("wlen_sample of STFT is not an integer.")
    nfft = int(wlen_sec * fs)
    hopsamp = int(hop_percent * nfft)
    if win != "hann":  # the reference NameErrors here (stft.py:141-143)
        raise ValueError(f"win={win!r}: the reference torch path only "
                         "builds a Hann window")
    return nfft, hopsamp, torch.hann_window(window_length=nfft)


def stft_pytorch(x, fs=16e3, wlen_sec=50e-3, win="hann", hop_percent=0.25,
                 center=True, pad_mode="reflect", pad_at_end=True):
    """(n_bins, n_frames, 2) real/imag torch spectrogram of a 1-D signal
    (reference stft.py:102-152, incl. its hop-pad-at-end quirk)."""
    import math

    import torch

    nfft, hopsamp, window = _torch_params(fs, wlen_sec, win, hop_percent)
    x = torch.as_tensor(np.asarray(x) if not torch.is_tensor(x) else x)
    if not torch.is_floating_point(x):
        x = x.float()
    if pad_at_end:
        # the reference's frame-count rounding test, verbatim semantics
        # (stft.py:134-139): pad one hop of zeros unless the length already
        # divides into an integer frame count
        utt_len = x.shape[-1] / fs
        if math.ceil(utt_len / wlen_sec / hop_percent) != int(
                utt_len / wlen_sec / hop_percent):
            x = torch.nn.functional.pad(x, (0, hopsamp), mode="constant")
    S = torch.stft(input=x, n_fft=nfft, hop_length=hopsamp, win_length=None,
                   window=window.to(x.dtype), center=center,
                   pad_mode=pad_mode, return_complex=True)
    return torch.view_as_real(S)


def istft_pytorch(Sxx, fs=16000, wlen_sec=50e-3, win="hann",
                  hop_percent=0.25, center=True, max_len=None):
    """Inverse of :func:`stft_pytorch` (reference stft.py:154-193). Accepts
    the (..., 2) real/imag layout or a complex tensor; ``max_len`` keeps the
    reference's (vestigial) ``[:int(max_len*fs)]`` slice."""
    import torch

    nfft, hopsamp, window = _torch_params(fs, wlen_sec, win, hop_percent)
    S = torch.as_tensor(np.asarray(Sxx) if not torch.is_tensor(Sxx) else Sxx)
    if not S.is_complex():
        if S.shape[-1] != 2:
            raise ValueError("istft_pytorch wants a complex tensor or the "
                             "(..., 2) real/imag layout stft_pytorch returns")
        S = torch.view_as_complex(S.contiguous())
    x = torch.istft(input=S, n_fft=nfft, hop_length=hopsamp,
                    window=window, center=center, normalized=False,
                    onesided=True)
    if max_len:
        x = x[..., :int(max_len * fs)]
    return x
