"""Label generators: voice-activity (VAD) and ideal-binary-mask (IBM) targets.

Pure jnp functions (trace-compatible, usable on host via numpy inputs too).
Semantics match /root/reference/packages/processing/target.py:

* ``clean_speech_vad`` (target.py:5-56): frame the time signal exactly like
  the STFT frontend, per-frame energy threshold ``power > 10**vad_threshold *
  min(power)``.
* ``clean_speech_ibm`` (target.py:58-70): ``20*log10(|S|+eps) > max - ibm_threshold``
  over the whole utterance spectrogram.
* ``noise_robust_clean_speech_ibm`` (target.py:72-104): IBM gated by VAD.
"""

from __future__ import annotations

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
    """IBM from a complex spectrogram (..., n_frames, n_bins) -> float32 mask."""
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
