"""Jittable STFT / ISTFT for TPU.

Design notes (TPU-first, not a translation):

* The DFT is evaluated as a **real matmul against precomputed cosine/sine
  basis matrices** with the analysis window folded in, so the whole
  frontend (frame -> window -> DFT -> |.|^2 [-> log]) is a pair of MXU
  matmuls plus fused elementwise ops.  XLA fuses the squares/log into the
  matmul epilogue; there is no FFT butterfly with its TPU-hostile strided
  gathers.  For the frame sizes used here (nfft=1024, 513 bins) the matmul
  costs ~1 MFLOP/frame and runs at MXU speed for batched frames.
* Framing exploits ``nfft % hop == 0``: the signal is reshaped to
  ``(T/hop, hop)`` and frames are built from ``ratio`` static slices, which
  XLA turns into cheap views — no gather.
* All shapes are static under ``jit``; per-utterance lengths in batched mode
  are handled by the callers with frame masks.

Semantics match the reference frontend (librosa parametrization) of
``/root/reference/packages/processing/stft.py``:

* ``stft``: stft.py:13-60 — nfft = wlen_sec*fs, hop = hop_percent*nfft,
  periodic Hann window, optional centering with reflect padding, and the
  quirky "pad hop samples at the end" float condition of stft.py:45-50,
  which we replicate bit-for-bit in :func:`padded_length`.
* ``istft``: stft.py:63-99 — windowed overlap-add with squared-window
  normalization and truncation to the original signal length.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class StftConfig:
    """STFT parametrization (defaults = the reference's production config,

    cf. /root/reference/scripts/evaluate_ntcd_M1.py:37-45)."""

    fs: int = 16000
    wlen_sec: float = 64e-3
    hop_percent: float = 0.25
    window: str = "hann"
    center: bool = False
    pad_mode: str = "reflect"
    pad_at_end: bool = True
    # (the reference stft() signature also takes a dtype parameter; here the
    # analysis is always float32-real/complex64 — TPU-native, and the only
    # precision every consumer uses — so no dtype knob is carried)

    @property
    def nfft(self) -> int:
        wlen = self.wlen_sec * self.fs
        if wlen != int(wlen):
            raise ValueError("STFT window length in samples is not an integer.")
        return int(wlen)

    @property
    def hop(self) -> int:
        return int(self.hop_percent * self.nfft)

    @property
    def n_bins(self) -> int:
        return self.nfft // 2 + 1


def periodic_hann(nfft: int) -> np.ndarray:
    """Periodic (DFT-even) Hann window, identical to
    scipy.signal.get_window('hann', nfft, fftbins=True) used by librosa and
    to torch.hann_window."""
    n = np.arange(nfft)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / nfft)).astype(np.float64)


def get_window(name: str, nfft: int) -> np.ndarray:
    if name != "hann":
        raise ValueError(f"unsupported window: {name!r}")
    return periodic_hann(nfft)


def padded_length(n_samples: int, cfg: StftConfig) -> int:
    """Length after the reference's end-padding rule (stft.py:45-50).

    The reference computes ``utt_len = len(x)/fs`` and pads ``hop`` zeros
    unless ``utt_len / wlen_sec / hop_percent`` is an exact float integer.
    Because 64e-3 is not binary-exact this occasionally pads even when
    ``n_samples % hop == 0`` — we replicate the float expression exactly so
    frame counts match the reference everywhere.
    """
    if not cfg.pad_at_end:
        return n_samples
    utt_len = n_samples / cfg.fs
    q = utt_len / cfg.wlen_sec / cfg.hop_percent
    if math.ceil(q) != int(q):
        return n_samples + cfg.hop
    return n_samples


def n_stft_frames(n_samples: int, cfg: StftConfig) -> int:
    """Number of STFT frames the reference (librosa) produces for a signal of
    ``n_samples`` samples **before** end-padding.

    NOTE: <= 0 for signals shorter than one analysis frame (center=False
    needs ~nfft samples); batching callers clamp to 1 (a sub-frame wav still
    occupies one zero-padded frame)."""
    t = padded_length(n_samples, cfg)
    if cfg.center:
        t = t + 2 * (cfg.nfft // 2)
    return 1 + (t - cfg.nfft) // cfg.hop


def n_stft_frames_clamped(n_samples: int, cfg: StftConfig) -> int:
    """``n_stft_frames`` floored at 1: a sub-frame wav still occupies one
    zero-padded frame in any batched layout. The single home of the clamp
    rule shared by the enhancement batch assembly and the sequence-training
    batcher (previously duplicated at both call sites)."""
    return max(1, n_stft_frames(n_samples, cfg))


def samples_for_frames(n_frames: int, cfg: StftConfig) -> int:
    """Inverse of the framing: samples needed so a signal yields (or, for
    the ISTFT, samples synthesizable from) ``n_frames`` frames — the centered
    transform trims nfft//2 from each end. Shared by the enhancement batch
    assembly, its coverage accounting, and the sequence-training batcher
    (previously three hand-maintained copies of this arithmetic)."""
    t = (n_frames - 1) * cfg.hop + cfg.nfft
    if cfg.center:
        t = max(t - 2 * (cfg.nfft // 2), 1)
    return t


@functools.lru_cache(maxsize=None)
def _dft_matrices(nfft: int, window: str):
    """(cos, -sin) analysis bases with the window folded in, shape (nfft, nbins).

    X[k] = sum_n w[n] x[n] e^{-2i pi k n / nfft}  =  (xw @ C)[k] + i (xw @ S)[k]
    """
    n_bins = nfft // 2 + 1
    n = np.arange(nfft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / nfft
    w = get_window(window, nfft)[:, None]
    cos = (np.cos(ang) * w).astype(np.float32)
    msin = (-np.sin(ang) * w).astype(np.float32)
    return cos, msin


@functools.lru_cache(maxsize=None)
def _idft_matrices(nfft: int):
    """Inverse-rFFT bases, shape (nbins, nfft).

    x[n] = (1/N) [X_0 + 2 sum_{0<k<N/2} (Re X_k cos - Im X_k sin) + X_{N/2} cos(pi n)]
         = Re(X) @ Cr + Im(X) @ Ci
    """
    n_bins = nfft // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(nfft)[None, :]
    ang = 2.0 * np.pi * k * n / nfft
    c = np.full((n_bins, 1), 2.0)
    c[0, 0] = 1.0
    if nfft % 2 == 0:
        c[-1, 0] = 1.0
    cr = (np.cos(ang) * c / nfft).astype(np.float32)
    ci = (-np.sin(ang) * c / nfft).astype(np.float32)
    return cr, ci


def _apply_end_pad(x: jnp.ndarray, n_samples: int, cfg: StftConfig) -> jnp.ndarray:
    t = padded_length(n_samples, cfg)
    if t != n_samples:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, t - n_samples)]
        x = jnp.pad(x, pad)
    return x


def _apply_center_pad(x: jnp.ndarray, cfg: StftConfig) -> jnp.ndarray:
    if not cfg.center:
        return x
    half = cfg.nfft // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
    return jnp.pad(x, pad, mode=cfg.pad_mode)


def frame_signal(x: jnp.ndarray, nfft: int, hop: int) -> jnp.ndarray:
    """Slice a signal (..., T) into overlapping frames (..., n_frames, nfft).

    Fast path for ``nfft % hop == 0``: reshape to hop-chunks and stack
    ``ratio`` shifted static slices (pure views under XLA). Falls back to a
    gather for irregular hops.
    """
    t = x.shape[-1]
    n_frames = 1 + (t - nfft) // hop
    if nfft % hop == 0:
        ratio = nfft // hop
        n_chunks = t // hop
        xr = x[..., : n_chunks * hop].reshape(*x.shape[:-1], n_chunks, hop)
        parts = [
            jax.lax.slice_in_dim(xr, k, k + n_frames, axis=x.ndim - 1)
            for k in range(ratio)
        ]
        return jnp.concatenate(parts, axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(nfft)[None, :]
    return x[..., idx]


def stft_realimag(x: jnp.ndarray, cfg: StftConfig = StftConfig()):
    """STFT of a (..., T) float signal -> (re, im), each (..., n_frames, n_bins).

    The primary TPU entry point: some TPU runtimes (and the axon tunnel used
    here) have no complex64 support, and the matmul-DFT formulation is
    natively real anyway. ``stft`` wraps this into complex64 for host-side
    convenience.

    NOTE: the reference returns (freq, frames); we use the TPU-friendly
    (frames, freq) layout (frames = batch rows on the MXU, freq = lanes).
    """
    n_samples = x.shape[-1]
    x = _apply_end_pad(x.astype(jnp.float32), n_samples, cfg)
    x = _apply_center_pad(x, cfg)
    frames = frame_signal(x, cfg.nfft, cfg.hop)
    cos, msin = _dft_matrices(cfg.nfft, cfg.window)
    re = jnp.matmul(frames, cos, precision=_HIGHEST)
    im = jnp.matmul(frames, msin, precision=_HIGHEST)
    return re, im


def stft(x: jnp.ndarray, cfg: StftConfig = StftConfig()) -> jnp.ndarray:
    """Complex STFT (host/CPU convenience wrapper over :func:`stft_realimag`)."""
    re, im = stft_realimag(x, cfg)
    return jax.lax.complex(re, im)


def stft_to_host(x, cfg: StftConfig = StftConfig()) -> np.ndarray:
    """Complex STFT fetched to HOST memory as two float reads.

    Equivalent to ``np.asarray(stft(x, cfg))``, but safe on every backend:
    the axon TPU tunnel cannot transfer complex arrays device->host (the
    read fails with ``UNIMPLEMENTED: TPU backend error``; on-device complex
    compute is fine — observed 2026-08-18). Use this wherever a spectrogram
    is computed on the default device but consumed by host-side numpy
    (figures, parity harnesses, builders)."""
    re, im = stft_realimag(jnp.asarray(x, jnp.float32), cfg)
    return np.asarray(re) + 1j * np.asarray(im)


def power_spectrogram(x: jnp.ndarray, cfg: StftConfig = StftConfig()) -> jnp.ndarray:
    """|STFT|^2 of a (..., T) signal -> (..., n_frames, n_bins), fully fused

    (two MXU matmuls + square-add epilogue; no complex intermediate)."""
    re, im = stft_realimag(x, cfg)
    return re * re + im * im


def log_power_spectrogram(
    x: jnp.ndarray, cfg: StftConfig = StftConfig(), eps: float = 1e-12
) -> jnp.ndarray:
    """log(|STFT|^2) — the training-input representation of the noisy-speech

    pipelines (reference data_handling.py:126-139 computes log power)."""
    return jnp.log(power_spectrogram(x, cfg) + eps)


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add (..., n_frames, nfft) -> (..., (n_frames-1)*hop + nfft).

    Fast path for nfft % hop == 0: split each frame into ``ratio`` hop-sized
    chunks and sum ``ratio`` shifted, zero-padded copies — static slices and
    adds only, no scatter.
    """
    *lead, n_frames, nfft = frames.shape
    out_len = (n_frames - 1) * hop + nfft
    if nfft % hop == 0:
        ratio = nfft // hop
        chunks = frames.reshape(*lead, n_frames, ratio, hop)
        total_chunks = n_frames + ratio - 1
        out = jnp.zeros((*lead, total_chunks, hop), dtype=frames.dtype)
        for k in range(ratio):
            part = chunks[..., :, k, :]
            pad = [(0, 0)] * len(lead) + [(k, total_chunks - n_frames - k), (0, 0)]
            out = out + jnp.pad(part, pad)
        return out.reshape(*lead, total_chunks * hop)[..., :out_len]
    out = jnp.zeros((*lead, out_len), dtype=frames.dtype)
    for i in range(n_frames):
        out = out.at[..., i * hop : i * hop + nfft].add(frames[..., i, :])
    return out


@functools.lru_cache(maxsize=64)  # keyed per n_frames: a ragged-length sweep
# would otherwise cache one (~n_frames*hop)-sample array per distinct length
# for the life of the process
def _window_sumsquare(window: str, nfft: int, hop: int, n_frames: int) -> np.ndarray:
    """Overlap-added squared synthesis window (librosa's ifft_window_sum)."""
    w2 = get_window(window, nfft) ** 2
    out = np.zeros((n_frames - 1) * hop + nfft)
    for i in range(n_frames):
        out[i * hop : i * hop + nfft] += w2
    return out.astype(np.float32)


def istft_np(S: np.ndarray, cfg: StftConfig = StftConfig(), length: int | None = None) -> np.ndarray:
    """Host-side (numpy) ISTFT with identical semantics to :func:`istft`.

    Used to finalize per-utterance outputs of batched device programs, where
    each utterance has its own frame count (the squared-window normalization
    depends on the exact frame count, so a batch-padded device ISTFT would be
    wrong near utterance ends).
    """
    n_frames, n_bins = S.shape[-2], S.shape[-1]
    nfft = cfg.nfft
    if n_bins != nfft // 2 + 1:
        raise ValueError(f"expected {nfft // 2 + 1} bins, got {n_bins}")
    cr, ci = _idft_matrices(nfft)
    frames = S.real.astype(np.float32) @ cr + S.imag.astype(np.float32) @ ci
    win = get_window(cfg.window, nfft).astype(np.float32)
    frames = frames * win
    out = np.zeros((*S.shape[:-2], (n_frames - 1) * cfg.hop + nfft), dtype=np.float32)
    for i in range(n_frames):
        out[..., i * cfg.hop : i * cfg.hop + nfft] += frames[..., i, :]
    wss = _window_sumsquare(cfg.window, nfft, cfg.hop, n_frames)
    good = wss > np.finfo(np.float32).tiny
    out[..., good] = out[..., good] / wss[good]
    if cfg.center:
        half = nfft // 2
        out = out[..., half:-half]
    if length is not None:
        if out.shape[-1] < length:  # librosa pads zeros up to `length`
            out = np.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, length - out.shape[-1])])
        out = out[..., :length]
    return out


def istft_realimag_masked(
    re: jnp.ndarray,
    im: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: StftConfig = StftConfig(),
) -> jnp.ndarray:
    """Batched on-device ISTFT over a padded utterance batch.

    The squared-window OLA normalization depends on each utterance's exact
    frame count, which is why a naive batch-padded ISTFT is wrong near
    utterance ends. Here the normalizer is computed *from the frame mask*:
    ``wss_b[t] = sum_i mask[b,i] w^2[t - i*hop]`` — i.e. the same overlap-add
    as the signal, applied to the mask-gated squared window. For every valid
    sample this equals librosa's per-utterance ifft_window_sum exactly, and
    masked (padded) frames contribute zero, so each utterance in the batch is
    reconstructed identically to a per-utterance :func:`istft` call
    (reference semantics: stft.py:63-99).

    Args:
        re, im: (B, N, n_bins) real/imag spectrogram parts (padded frames
            must be zero — the enhancement masks guarantee this).
        mask: (B, N) 1.0 for valid frames.
    Returns:
        (B, T) float32 waveforms, zero beyond each utterance's extent.
    """
    *_, n_frames, n_bins = re.shape
    nfft = cfg.nfft
    if n_bins != nfft // 2 + 1:
        raise ValueError(f"expected {nfft // 2 + 1} bins, got {n_bins}")
    cr, ci = _idft_matrices(nfft)
    frames = jnp.matmul(re, cr, precision=_HIGHEST) + jnp.matmul(
        im, ci, precision=_HIGHEST
    )
    win = jnp.asarray(get_window(cfg.window, nfft), dtype=jnp.float32)
    m = mask.astype(jnp.float32)[..., None]
    x = _overlap_add(frames * win * m, cfg.hop)
    w2 = jnp.asarray((get_window(cfg.window, nfft) ** 2).astype(np.float32))
    wss = _overlap_add(jnp.broadcast_to(w2, frames.shape) * m, cfg.hop)
    x = jnp.where(wss > np.finfo(np.float32).tiny, x / jnp.maximum(wss, 1e-37), x)
    if cfg.center:
        half = nfft // 2
        x = x[..., half:-half]
    return x


def istft(
    S: jnp.ndarray,
    cfg: StftConfig = StftConfig(),
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT of (..., n_frames, n_bins) complex -> (..., T) float32.

    Matches librosa.istft semantics (windowed OLA, squared-window
    normalization with a tiny-threshold guard, center trimming, and
    truncation to ``length`` samples), cf. reference stft.py:63-99.
    """
    *_, n_frames, n_bins = S.shape
    nfft = cfg.nfft
    if n_bins != nfft // 2 + 1:
        raise ValueError(f"expected {nfft // 2 + 1} bins, got {n_bins}")
    cr, ci = _idft_matrices(nfft)
    re = jnp.real(S).astype(jnp.float32)
    im = jnp.imag(S).astype(jnp.float32)
    frames = jnp.matmul(re, cr, precision=_HIGHEST) + jnp.matmul(
        im, ci, precision=_HIGHEST
    )
    win = jnp.asarray(get_window(cfg.window, nfft), dtype=jnp.float32)
    x = _overlap_add(frames * win, cfg.hop)
    wss = jnp.asarray(_window_sumsquare(cfg.window, nfft, cfg.hop, n_frames))
    # librosa guards with np.finfo(float32).tiny (~1.18e-38)
    x = jnp.where(wss > np.finfo(np.float32).tiny, x / jnp.maximum(wss, 1e-37), x)
    if cfg.center:
        half = nfft // 2
        x = x[..., half:-half]
    if length is not None:
        if x.shape[-1] < length:  # librosa pads zeros up to `length`
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, length - x.shape[-1])])
        x = x[..., :length]
    return x
