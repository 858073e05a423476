"""Reference-signature label generators (compat shim over dvae_tpu.ops.targets).

Matches /root/reference/packages/processing/target.py:5-251: the reference's
parameter names/defaults, numpy in/out, ``(1, n_frames)`` VAD rows and
frequency-major masks. The legacy threshold-IBM trio passes through (our
natives were built value-parity against the reference code in the same
orientation)."""

from __future__ import annotations

import numpy as np

from dvae_tpu.ops import targets as _t
from dvae_tpu.ops.stft import StftConfig


def _cfg(fs, wlen_sec, hop_percent, center, pad_mode, pad_at_end):
    return StftConfig(fs=int(fs), wlen_sec=wlen_sec, hop_percent=hop_percent,
                      center=center, pad_mode=pad_mode, pad_at_end=pad_at_end)


def clean_speech_VAD(speech_t, fs=16e3, wlen_sec=50e-3, hop_percent=0.25,
                     center=True, pad_mode="reflect", pad_at_end=True,
                     vad_threshold=1.70):
    """(1, n_frames) float32 — the reference's row layout (target.py:5-56)."""
    import jax.numpy as jnp

    cfg = _cfg(fs, wlen_sec, hop_percent, center, pad_mode, pad_at_end)
    vad = _t.clean_speech_vad(jnp.asarray(speech_t, jnp.float32), cfg,
                              vad_threshold=vad_threshold)
    return np.asarray(vad, np.float32)[None, :]


def clean_speech_IBM(speech_tf, eps=1e-8, ibm_threshold=50):
    """Mask in the input's own orientation (the threshold peak is global,
    target.py:58-70). Pass the magnitude when targeting the real chip."""
    import jax.numpy as jnp

    # magnitude upload: complex host->device transfers fail over the tunnel
    mag = np.abs(np.asarray(speech_tf))
    return np.asarray(_t.clean_speech_ibm(jnp.asarray(mag, jnp.float32),
                                          eps=eps, ibm_threshold=ibm_threshold),
                      np.float32)


def noise_robust_clean_speech_IBM(speech_t, speech_tf, fs=16e3,
                                  wlen_sec=50e-3, hop_percent=0.25,
                                  center=True, pad_mode="reflect",
                                  pad_at_end=True, vad_threshold=1.70,
                                  eps=1e-8, ibm_threshold=50):
    """IBM (frequency-major) gated by the VAD row (target.py:72-104)."""
    vad = clean_speech_VAD(speech_t, fs, wlen_sec, hop_percent, center,
                           pad_mode, pad_at_end, vad_threshold)
    ibm = clean_speech_IBM(speech_tf, eps, ibm_threshold)
    return (ibm * vad).astype(np.float32)


def _voiced_unvoiced_split_characteristic(number_of_frequency_bins):
    return _t.voiced_unvoiced_split_characteristic(number_of_frequency_bins)


def noise_aware_IBM(X, N, threshold_unvoiced_speech=5, threshold_voiced_speech=0,
                    threshold_unvoiced_noise=-10, threshold_voiced_noise=-10,
                    low_cut=5, high_cut=500):
    """(speech mask, noise mask) bool tuple, (frames, bins) orientation
    (target.py:151-203). |X|² = X·X̄, so magnitudes are accepted too."""
    import jax.numpy as jnp

    s, n = _t.noise_aware_ibm(
        jnp.asarray(np.abs(np.asarray(X)), jnp.float32),
        jnp.asarray(np.abs(np.asarray(N)), jnp.float32),
        threshold_unvoiced_speech, threshold_voiced_speech,
        threshold_unvoiced_noise, threshold_voiced_noise,
        low_cut, high_cut)
    return np.asarray(s), np.asarray(n)


def threshold_IBM(X, threshold_unvoiced_speech=5, threshold_voiced_speech=0,
                  threshold_unvoiced_noise=-10, threshold_voiced_noise=-10,
                  low_cut=5, high_cut=500):
    """Speech bool mask vs a flat noise PSD of 10 (target.py:205-251).
    The two noise thresholds only feed a computed-but-unused tensor in the
    reference; accepted here for signature parity, with the same net
    no-effect."""
    import jax.numpy as jnp

    return np.asarray(_t.threshold_ibm(
        jnp.asarray(np.abs(np.asarray(X)), jnp.float32),
        threshold_unvoiced_speech, threshold_voiced_speech,
        low_cut, high_cut))
