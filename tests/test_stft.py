"""Signal-layer tests: STFT parity vs. an independent numpy/rFFT oracle with
librosa's exact parametrization, round-trip reconstruction, and frame-count
rules (including the reference's float end-padding quirk)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from dvae_tpu.ops.stft import (
    StftConfig,
    istft,
    n_stft_frames,
    padded_length,
    periodic_hann,
    power_spectrogram,
    stft,
)

CFG = StftConfig()  # 16 kHz, 64 ms, 25% hop, center=False, pad_at_end


def _oracle_stft(x: np.ndarray, cfg: StftConfig) -> np.ndarray:
    """Independent reimplementation with np.fft: frame -> window -> rFFT,
    replicating librosa's conventions for the given flags."""
    x = np.asarray(x, dtype=np.float64)
    t = padded_length(len(x), cfg)
    x = np.pad(x, (0, t - len(x)))
    if cfg.center:
        x = np.pad(x, cfg.nfft // 2, mode=cfg.pad_mode)
    n_frames = 1 + (len(x) - cfg.nfft) // cfg.hop
    win = periodic_hann(cfg.nfft)
    out = np.empty((n_frames, cfg.nfft // 2 + 1), dtype=np.complex128)
    for i in range(n_frames):
        seg = x[i * cfg.hop : i * cfg.hop + cfg.nfft] * win
        out[i] = np.fft.rfft(seg)
    return out


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(0)
    t = np.arange(20000) / CFG.fs
    return (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1333 * t)
        + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)


def test_stft_matches_fft_oracle(signal):
    ours = np.asarray(stft(jnp.asarray(signal), CFG))
    ref = _oracle_stft(signal, CFG)
    assert ours.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=2e-4 * scale)


def test_stft_center_true_matches_oracle(signal):
    cfg = StftConfig(center=True)
    ours = np.asarray(stft(jnp.asarray(signal), cfg))
    ref = _oracle_stft(signal, cfg)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4 * np.abs(ref).max())


def test_power_spectrogram_is_abs2(signal):
    p = np.asarray(power_spectrogram(jnp.asarray(signal), CFG))
    ref = np.abs(_oracle_stft(signal, CFG)) ** 2
    np.testing.assert_allclose(p, ref, atol=5e-4 * ref.max())


def test_istft_roundtrip(signal):
    S = stft(jnp.asarray(signal), CFG)
    x = np.asarray(istft(S, CFG, length=len(signal)))
    assert x.shape == signal.shape
    # OLA of a 25%-hop Hann is COLA; interior reconstruction is near-exact.
    err = np.abs(x[CFG.nfft : -CFG.nfft] - signal[CFG.nfft : -CFG.nfft])
    assert err.max() < 1e-4


def test_istft_roundtrip_center_true(signal):
    cfg = StftConfig(center=True)
    S = stft(jnp.asarray(signal), cfg)
    x = np.asarray(istft(S, cfg, length=len(signal)))
    err = np.abs(x[cfg.nfft : -cfg.nfft] - signal[cfg.nfft : -cfg.nfft])
    assert err.max() < 1e-4


def test_batched_stft(signal):
    batch = jnp.stack([jnp.asarray(signal), 2 * jnp.asarray(signal)])
    S = stft(batch, CFG)
    s0 = stft(jnp.asarray(signal), CFG)
    assert S.shape == (2,) + s0.shape
    np.testing.assert_allclose(np.asarray(S[0]), np.asarray(s0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(S[1]), 2 * np.asarray(s0), rtol=1e-5, atol=1e-5
    )


def test_padded_length_replicates_reference_float_quirk():
    cfg = CFG
    for n in [20000, 51200, 16000, 16384, 12345, 256 * 100, 256 * 173]:
        utt_len = n / cfg.fs
        q = utt_len / cfg.wlen_sec / cfg.hop_percent
        expect = n + cfg.hop if math.ceil(q) != int(q) else n
        assert padded_length(n, cfg) == expect


def test_n_stft_frames_matches_actual(signal):
    assert stft(jnp.asarray(signal), CFG).shape[-2] == n_stft_frames(len(signal), CFG)
    cfg = StftConfig(center=True)
    assert stft(jnp.asarray(signal), cfg).shape[-2] == n_stft_frames(len(signal), cfg)


def test_istft_masked_batch_matches_per_utterance(signal):
    """The mask-normalized batched device ISTFT must reconstruct each ragged
    utterance exactly as a per-utterance host ISTFT of its trimmed frames."""
    from dvae_tpu.ops.stft import istft_np, istft_realimag_masked, stft_realimag

    rng = np.random.default_rng(7)
    lengths = [len(signal), len(signal) - 3 * CFG.hop - 17, len(signal) // 2]
    wavs = [rng.standard_normal(t).astype(np.float32) * 0.3 for t in lengths]
    frames = [n_stft_frames(t, CFG) for t in lengths]
    n_pad = max(frames) + 5  # deliberately over-padded
    t_pad = (n_pad - 1) * CFG.hop + CFG.nfft

    x = np.zeros((len(wavs), t_pad), np.float32)
    mask = np.zeros((len(wavs), n_pad), np.float32)
    for i, w in enumerate(wavs):
        x[i, : len(w)] = w
        mask[i, : frames[i]] = 1.0

    re, im = stft_realimag(jnp.asarray(x), CFG)
    re = np.asarray(re)[:, :n_pad] * mask[:, :, None]
    im = np.asarray(im)[:, :n_pad] * mask[:, :, None]
    out = np.asarray(
        istft_realimag_masked(jnp.asarray(re), jnp.asarray(im), jnp.asarray(mask), CFG)
    )
    from dvae_tpu.ops.stft import _window_sumsquare

    for i, w in enumerate(wavs):
        S_i = re[i, : frames[i]] + 1j * im[i, : frames[i]]
        ref = istft_np(S_i, CFG, length=len(w))
        # where the OLA window-sumsquare is well conditioned, match tightly;
        # near window zeros the 1/wss normalization amplifies float32 noise
        # identically to librosa, so only bound the absolute error there.
        wss = _window_sumsquare(CFG.window, CFG.nfft, CFG.hop, frames[i])[: len(w)]
        good = wss > 1e-6
        np.testing.assert_allclose(
            out[i, : len(w)][good], ref[good], rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(out[i, : len(w)], ref, atol=1e-3)
        # beyond the utterance: exactly zero (masked frames contribute nothing)
        assert np.abs(out[i, len(w) + CFG.nfft :]).max() == 0.0


def test_n_stft_frames_boundary_lengths():
    """Frame-count contract at hop/nfft boundaries (±1 sample), where
    off-by-one bugs in the end-padding rule would land — swept for both
    center modes against the actual transform."""
    rng = np.random.default_rng(5)
    lengths = set()
    for base in (CFG.nfft, 4 * CFG.hop, 40 * CFG.hop, 173 * CFG.hop):
        lengths.update((base - 1, base, base + 1))
    for n in sorted(lengths):
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        for cfg in (CFG, StftConfig(center=True)):
            got = stft(x, cfg).shape[-2]
            assert got == n_stft_frames(n, cfg), (n, cfg.center, got)


def test_stft_to_host_matches_complex_fetch():
    """stft_to_host = np.asarray(stft(.)) via two float reads. It exists
    because the axon TPU tunnel cannot transfer complex dtypes device->host
    (UNIMPLEMENTED on the read — every host consumer of device spectra must
    go through it to be chip-safe); on CPU both paths must agree exactly."""
    from dvae_tpu.ops.stft import stft_to_host

    rng = np.random.default_rng(11)
    x = rng.standard_normal(12345).astype(np.float32)
    via_host = stft_to_host(x, CFG)
    via_complex = np.asarray(stft(jnp.asarray(x), CFG))
    assert via_host.dtype == np.complex64
    np.testing.assert_array_equal(via_host, via_complex)
