"""Validation vectors for eval/stoi.py against an INDEPENDENT oracle.

The reference scores with the pystoi package (run_metrics.py:22,133). That
package (and any network to fetch its outputs) is unavailable here, so true
external vectors cannot be vendored. The strongest evidence this environment
allows — and what this file provides — is:

1. a second implementation of STOI/ESTOI written separately, straight from
   the published algorithm descriptions (Taal et al. 2011; Jensen & Taal
   2016), with deliberately different code structure (per-segment loops,
   scipy.fft, explicit band edges) so shared bugs are unlikely;
2. cross-checks of eval/stoi.py against it on speech+noise mixtures at many
   SNRs AND on real corpus wavs (agreement < 1e-6 — the two codebases
   compute the same published math independently);
3. frozen score vectors (generated once from the oracle on this machine)
   pinned with 1e-3 tolerance, so any future drift in either implementation
   fails loudly.

If pystoi ever becomes importable, test_against_pystoi_if_available runs the
real external comparison automatically.
"""

import numpy as np
import pytest
import scipy.fft
from scipy.signal import resample_poly

from dvae_tpu.data.io import read_wav
from dvae_tpu.eval.stoi import stoi


# ---------------------------------------------------------------------------
# Independent oracle: naive, loop-based, from the published algorithm
# ---------------------------------------------------------------------------

def _oracle_band_edges():
    cf = 150.0 * 2.0 ** (np.arange(15) / 3.0)
    return cf * 2.0 ** (-1.0 / 6.0), cf * 2.0 ** (1.0 / 6.0)


def _oracle_octave_bands(frames_fft):
    """(T, 257) magnitude-square spectra -> (T, 15) band magnitudes."""
    f = np.linspace(0, 10000, 513)[:257]
    lo, hi = _oracle_band_edges()
    out = np.zeros((frames_fft.shape[0], 15))
    for b in range(15):
        il = int(np.argmin((f - lo[b]) ** 2))
        ir = int(np.argmin((f - hi[b]) ** 2))
        out[:, b] = np.sqrt(np.sum(frames_fft[:, il:ir], axis=1))
    return out


def _oracle_frames(x):
    w = np.hanning(258)[1:-1]
    n = 1 + (len(x) - 256) // 128
    return np.stack([x[t * 128 : t * 128 + 256] * w for t in range(n)])


def _oracle_silent_removal(x, y):
    xf, yf = _oracle_frames(x), _oracle_frames(y)
    e = np.array([20 * np.log10(np.linalg.norm(fr) + np.finfo(np.float64).eps)
                  for fr in xf])
    keep = np.flatnonzero(e > e.max() - 40.0)
    xs = np.zeros((len(keep) - 1) * 128 + 256 if len(keep) else 0)
    ys = np.zeros_like(xs)
    for i, t in enumerate(keep):
        xs[i * 128 : i * 128 + 256] += xf[t]
        ys[i * 128 : i * 128 + 256] += yf[t]
    return xs, ys


def _oracle_estoi(x, y, fs):
    if fs != 10000:
        x = resample_poly(np.asarray(x, np.float64), 10000, fs)
        y = resample_poly(np.asarray(y, np.float64), 10000, fs)
    x, y = _oracle_silent_removal(x, y)
    X = _oracle_octave_bands(np.abs(scipy.fft.rfft(_oracle_frames(x), 512)) ** 2)
    Y = _oracle_octave_bands(np.abs(scipy.fft.rfft(_oracle_frames(y), 512)) ** 2)
    N = 30
    eps = np.finfo(np.float64).eps
    scores = []
    for m in range(N, X.shape[0] + 1):
        xs, ys = X[m - N : m].T, Y[m - N : m].T  # (15 bands, 30 frames)
        # row normalization (time, per band)
        xs = xs - xs.mean(axis=1, keepdims=True)
        xs = xs / (np.linalg.norm(xs, axis=1, keepdims=True) + eps)
        ys = ys - ys.mean(axis=1, keepdims=True)
        ys = ys / (np.linalg.norm(ys, axis=1, keepdims=True) + eps)
        # column normalization (bands, per frame)
        xs = xs - xs.mean(axis=0, keepdims=True)
        xs = xs / (np.linalg.norm(xs, axis=0, keepdims=True) + eps)
        ys = ys - ys.mean(axis=0, keepdims=True)
        ys = ys / (np.linalg.norm(ys, axis=0, keepdims=True) + eps)
        scores.append(np.sum(xs * ys) / N)
    return float(np.mean(scores))


def _oracle_stoi(x, y, fs):
    """Plain STOI (Taal 2011): per-band clipped correlation over segments."""
    if fs != 10000:
        x = resample_poly(np.asarray(x, np.float64), 10000, fs)
        y = resample_poly(np.asarray(y, np.float64), 10000, fs)
    x, y = _oracle_silent_removal(x, y)
    X = _oracle_octave_bands(np.abs(scipy.fft.rfft(_oracle_frames(x), 512)) ** 2)
    Y = _oracle_octave_bands(np.abs(scipy.fft.rfft(_oracle_frames(y), 512)) ** 2)
    N = 30
    eps = np.finfo(np.float64).eps
    clip = 10 ** (15.0 / 20.0)  # -beta dB
    scores = []
    for m in range(N, X.shape[0] + 1):
        xs, ys = X[m - N : m], Y[m - N : m]  # (30, 15)
        alpha = np.linalg.norm(xs, axis=0) / (np.linalg.norm(ys, axis=0) + eps)
        ys = np.minimum(ys * alpha[None, :], xs * (1 + clip))
        for b in range(15):
            xb = xs[:, b] - xs[:, b].mean()
            yb = ys[:, b] - ys[:, b].mean()
            scores.append(np.sum(xb * yb)
                          / (np.linalg.norm(xb) * np.linalg.norm(yb) + eps))
    return float(np.mean(scores))


def _speechlike(n=40000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    f0 = 110.0 + 30.0 * np.sin(2 * np.pi * 1.7 * t)
    sig = sum(np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi)) / k
              for k in range(1, 10))
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.5 * t)) + 0.08
    return (sig * env).astype(np.float64)


def test_estoi_matches_independent_oracle_synthetic():
    x = _speechlike()
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(x.size)
    noise *= np.linalg.norm(x) / np.linalg.norm(noise)
    for snr in (-5.0, 0.0, 5.0, 15.0):
        y = x + noise * 10 ** (-snr / 20.0)
        ours = stoi(x, y, 16000, extended=True, compat="matlab")
        oracle = _oracle_estoi(x, y, 16000)
        assert abs(ours - oracle) < 1e-6, (snr, ours, oracle)


def test_plain_stoi_matches_independent_oracle():
    x = _speechlike()
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(x.size)
    noise *= np.linalg.norm(x) / np.linalg.norm(noise)
    for snr in (-5.0, 5.0, 15.0):
        y = x + noise * 10 ** (-snr / 20.0)
        ours = stoi(x, y, 16000, extended=False, compat="matlab")
        oracle = _oracle_stoi(x, y, 16000)
        assert abs(ours - oracle) < 1e-6, (snr, ours, oracle)


def test_estoi_matches_independent_oracle_corpus(subset_dir):
    base = subset_dir / "processed/ntcd_timit"
    for utt in ("sa1", "si494"):
        clean, fs = read_wav(base / f"Clean/test/34M/{utt}.wav")
        noisy, _ = read_wav(base / f"Noisy/Babble/-5/test/34M/{utt}.wav")
        n = min(len(clean), len(noisy))
        ours = stoi(clean[:n], noisy[:n], fs, extended=True, compat="matlab")
        oracle = _oracle_estoi(clean[:n], noisy[:n], fs)
        assert abs(ours - oracle) < 1e-6, (utt, ours, oracle)


def test_estoi_frozen_vectors():
    """Scores frozen at vendor time (2026-08-17, this machine), one set per
    framing convention (module docstring of eval/stoi.py). The "matlab"
    values equal the independent oracle's; the "pystoi" values differ by the
    one dropped frame. Regenerate deliberately, never by copying a failing
    value."""
    x = _speechlike()
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(x.size)
    noise *= np.linalg.norm(x) / np.linalg.norm(noise)
    expected = {
        -5.0: {"matlab": 0.425392, "pystoi": 0.425111},
        0.0: {"matlab": 0.566645, "pystoi": 0.566252},
        5.0: {"matlab": 0.696383, "pystoi": 0.695825},
        15.0: {"matlab": 0.834985, "pystoi": 0.834224},
    }
    for snr, wants in expected.items():
        y = x + noise * 10 ** (-snr / 20.0)
        for compat, want in wants.items():
            got = stoi(x, y, 16000, extended=True, compat=compat)
            assert abs(got - want) < 1e-3, (snr, compat, got, want)


def test_framing_fencepost_between_conventions():
    """pystoi's exclusive-stop framing analyzes exactly one fewer frame than
    the published MATLAB algorithm whenever (len - 256) % 128 == 0 — which
    silent-frame removal makes true for every real call."""
    from dvae_tpu.eval.stoi import _n_frames

    assert _n_frames(256 + 10 * 128, "matlab") == 11
    assert _n_frames(256 + 10 * 128, "pystoi") == 10
    # non-aligned lengths agree
    assert _n_frames(256 + 10 * 128 + 1, "matlab") == 11
    assert _n_frames(256 + 10 * 128 + 1, "pystoi") == 11
    # degenerate: shorter than one frame
    assert _n_frames(200, "matlab") == 0 and _n_frames(200, "pystoi") == 0
    assert _n_frames(256, "matlab") == 1 and _n_frames(256, "pystoi") == 0
    # default is the reference's convention (pystoi)
    x = _speechlike()
    rng = np.random.default_rng(7)
    y = x + 0.5 * rng.standard_normal(x.size)
    assert stoi(x, y, 16000) == stoi(x, y, 16000, compat="pystoi")
    assert stoi(x, y, 16000) != stoi(x, y, 16000, compat="matlab")


def test_against_pystoi_if_available():
    pystoi = pytest.importorskip("pystoi")
    x = _speechlike()
    rng = np.random.default_rng(2)
    y = x + 0.3 * rng.standard_normal(x.size)
    ours = stoi(x, y, 16000, extended=True)
    ext = pystoi.stoi(x, y, 16000, extended=True)
    assert abs(ours - ext) < 1e-3
