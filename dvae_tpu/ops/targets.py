"""Label generators: voice-activity (VAD) and ideal-binary-mask (IBM) targets.

Pure jnp functions (trace-compatible, usable on host via numpy inputs too).
Semantics match /root/reference/packages/processing/target.py:

* ``clean_speech_vad`` (target.py:5-56): frame the time signal exactly like
  the STFT frontend, per-frame energy threshold ``power > 10**vad_threshold *
  min(power)``.
* ``clean_speech_ibm`` (target.py:58-70): ``20*log10(|S|+eps) > max - ibm_threshold``
  over the whole utterance spectrogram.
* ``noise_robust_clean_speech_ibm`` (target.py:72-104): IBM gated by VAD.
* Legacy threshold-IBM family (target.py:110-251, dead code in the
  reference's scripts but part of its library surface):
  ``voiced_unvoiced_split_characteristic``, ``noise_aware_ibm``,
  ``threshold_ibm``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from dvae_tpu.ops.stft import StftConfig, _apply_center_pad, _apply_end_pad, frame_signal


def clean_speech_vad(
    speech_t: jnp.ndarray,
    cfg: StftConfig = StftConfig(),
    vad_threshold: float = 1.70,
) -> jnp.ndarray:
    """Time-domain energy VAD for a (..., T) signal -> (..., n_frames) float32.

    NOTE: the min() is per-utterance; in batched use, call per utterance or
    vmap with equal true lengths — padded frames would corrupt the min.
    """
    x = speech_t.astype(jnp.float32)
    x = _apply_end_pad(x, x.shape[-1], cfg)
    x = _apply_center_pad(x, cfg)
    frames = frame_signal(x, cfg.nfft, cfg.hop)  # (..., n_frames, nfft)
    power = jnp.sum(frames * frames, axis=-1)
    floor = jnp.min(power, axis=-1, keepdims=True)
    vad = power > (10.0 ** vad_threshold) * floor
    return vad.astype(jnp.float32)


def clean_speech_ibm(
    speech_tf: jnp.ndarray,
    eps: float = 1e-8,
    ibm_threshold: float = 50.0,
) -> jnp.ndarray:
    """IBM from a spectrogram (..., n_frames, n_bins) -> float32 mask.

    Accepts the complex STFT or its magnitude (abs is taken first, so the
    two are equivalent). Host callers targeting the real chip should pass
    the MAGNITUDE: complex arrays cannot cross the axon tunnel in either
    direction (see ops/stft.py::stft_to_host)."""
    mag = jnp.abs(speech_tf)
    power_db = 20.0 * jnp.log10(mag + eps)
    peak = jnp.max(power_db, axis=(-2, -1), keepdims=True)
    mask = power_db > peak - ibm_threshold
    return mask.astype(jnp.float32)


def noise_robust_clean_speech_ibm(
    speech_t: jnp.ndarray,
    speech_tf: jnp.ndarray,
    cfg: StftConfig = StftConfig(),
    vad_threshold: float = 1.70,
    eps: float = 1e-8,
    ibm_threshold: float = 50.0,
) -> jnp.ndarray:
    """IBM gated by the time-domain VAD (robust to noise before/after speech)."""
    vad = clean_speech_vad(speech_t, cfg, vad_threshold)  # (..., n_frames)
    ibm = clean_speech_ibm(speech_tf, eps, ibm_threshold)  # (..., n_frames, n_bins)
    return ibm * vad[..., :, None]


# ---------------------------------------------------------------------------
# Legacy threshold-based IBM family (reference target.py:110-251).
#
# Dead code in the reference's entry-point scripts, kept for library parity.
# The voiced/unvoiced weighting depends only on the (static) bin count, so it
# is computed once in numpy and baked into the traced program as a constant —
# the per-frame work stays jnp (vectorized comparisons, MXU-free but fused).
# ---------------------------------------------------------------------------


def voiced_unvoiced_split_characteristic(n_bins: int) -> tuple[np.ndarray, np.ndarray]:
    """Frequency weighting curves splitting bins into voiced/unvoiced regions.

    Value-parity with reference target.py:110-149 including its off-by-one
    slice conventions (the raised-cosine transition is written starting at
    index ``start-1``, the low-edge fast transition overlaps the hard zero
    region by one bin, and unvoiced's hard-zero low region overwrites the
    first transition bin).
    """
    split_bin, transition_width = 200, 99
    fast_transition_width, low_bin, high_bin = 5, 4, 500

    transition = 0.5 * (1.0 + np.cos(np.pi / (transition_width - 1)
                                     * np.arange(transition_width)))
    fast_transition = 0.5 * (1.0 + np.cos(np.pi / (fast_transition_width - 1)
                                          * np.arange(fast_transition_width)))
    start = int(split_bin - transition_width / 2)

    voiced = np.ones(n_bins)
    voiced[start - 1: start - 1 + transition_width] = transition
    voiced[start - 1 + transition_width:] = 0.0
    voiced[:low_bin] = 0.0
    voiced[low_bin - 1: low_bin - 1 + fast_transition_width] = 1.0 - fast_transition

    unvoiced = np.ones(n_bins)
    unvoiced[start - 1: start - 1 + transition_width] = 1.0 - transition
    unvoiced[:start] = 0.0
    unvoiced[high_bin - 1:] = 0.0
    unvoiced[high_bin - 1: high_bin - 1 + fast_transition_width] = fast_transition

    return voiced, unvoiced


def _threshold_psd(speech_tf, threshold_voiced, threshold_unvoiced, n_bins):
    """PSD of X divided by the per-bin 10^(threshold/10) weighting."""
    voiced, unvoiced = voiced_unvoiced_split_characteristic(n_bins)
    threshold_db = threshold_voiced * voiced + threshold_unvoiced * unvoiced
    x_psd = jnp.abs(speech_tf) ** 2  # == real(X·conj X); numpy's complex
    # ordering compares real parts first, so the reference's complex
    # comparisons reduce to exactly this
    return x_psd / np.power(10.0, threshold_db / 10.0)


def noise_aware_ibm(
    speech_tf: jnp.ndarray,
    noise_tf: jnp.ndarray,
    threshold_unvoiced_speech: float = 5.0,
    threshold_voiced_speech: float = 0.0,
    threshold_unvoiced_noise: float = -10.0,
    threshold_voiced_noise: float = -10.0,
    low_cut: int = 5,
    high_cut: int = 500,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Speech/noise binary masks from clean-speech and noise spectrograms.

    Value-parity with reference target.py:151-203 (``noise_aware_IBM``),
    including the asymmetric edge handling: the speech mask zeroes
    ``[0, low_cut-1)`` and ``[high_cut, F)`` while the noise mask sets the
    same regions to 1, and the ``0.005`` absolute PSD floor enters the speech
    mask with AND but the noise mask with OR.
    """
    n_bins = speech_tf.shape[-1]
    xpsd_s = _threshold_psd(speech_tf, threshold_voiced_speech,
                            threshold_unvoiced_speech, n_bins)
    xpsd_n = _threshold_psd(speech_tf, threshold_unvoiced_noise,
                            threshold_voiced_noise, n_bins)
    npsd = jnp.abs(noise_tf) ** 2

    bin_idx = np.arange(n_bins)
    edge = (bin_idx < low_cut - 1) | (bin_idx >= high_cut)

    speech_mask = (xpsd_s > npsd) & (xpsd_s > 0.005) & ~edge
    noise_mask = (xpsd_n < npsd) | (xpsd_n < 0.005) | edge
    return speech_mask, noise_mask


def threshold_ibm(
    speech_tf: jnp.ndarray,
    threshold_unvoiced_speech: float = 5.0,
    threshold_voiced_speech: float = 0.0,
    low_cut: int = 5,
    high_cut: int = 500,
    npsd: float = 10.0,
) -> jnp.ndarray:
    """Speech mask against a flat noise-PSD constant (reference
    target.py:205-251, ``threshold_IBM`` — its noise-PSD input is hardcoded
    to 10)."""
    n_bins = speech_tf.shape[-1]
    xpsd_s = _threshold_psd(speech_tf, threshold_voiced_speech,
                            threshold_unvoiced_speech, n_bins)
    bin_idx = np.arange(n_bins)
    edge = (bin_idx < low_cut - 1) | (bin_idx >= high_cut)
    return (xpsd_s > npsd) & (xpsd_s > 0.005) & ~edge
