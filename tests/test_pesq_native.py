"""Native wideband PESQ (eval/pesq_native.py) validation.

The licensed wheel and the ITU conformance vectors are unavailable here (see
the module docstring), so validation is by construction and behavior:

* identical signals score the P.862.2 maximum (4.64);
* golden-wav absolute values regression-pinned (vs first measurement on this
  machine, same convention as tests/test_golden_metrics.py);
* monotone in additive-noise SNR;
* invariant to input level (the level-alignment stage);
* robust to a constant delay (the time-alignment stage);
* the dispatcher eval.pesq.pesq routes 'wb' to the native scorer when the
  wheel is absent.
"""

import numpy as np
import pytest

from dvae_tpu.data.io import read_wav
from dvae_tpu.eval.pesq_native import pesq_wb

from _helpers import (GOLDEN_MODELS as G, M1_GOLDEN, M2_GOLDEN,
                      require_golden_models)
BASE = "/root/reference/data/subset/processed/ntcd_timit"
M1, M2 = M1_GOLDEN, M2_GOLDEN


def _speechlike(n=32000, seed=0):
    """Amplitude-modulated harmonic tone — enough speech structure for the
    active-level and loudness stages to behave."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    f0 = 120.0 + 20.0 * np.sin(2 * np.pi * 2.0 * t)
    sig = sum(np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi))
              / k for k in range(1, 12))
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t - np.pi / 2)) + 0.05
    return (sig * env).astype(np.float64)


def test_identical_signals_score_maximum():
    x = _speechlike()
    assert abs(pesq_wb(x, x) - 4.644) < 0.01


def test_golden_wavs_pinned(subset_dir):
    require_golden_models()
    clean, fs = read_wav(f"{BASE}/Clean/test/34M/sa1.wav")
    pins = {
        f"{BASE}/Noisy/Babble/-5/test/34M/sa1.wav": 1.176,
        f"{G}/{M1}/ntcd_timit/Clean/test/34M/sa1_s_est.wav": 1.168,
        f"{G}/{M2}/ntcd_timit/Clean/test/34M/sa1_s_est.wav": 1.578,
    }
    for path, want in pins.items():
        deg, _ = read_wav(path)
        n = min(len(clean), len(deg))
        got = pesq_wb(clean[:n], deg[:n], fs)
        assert abs(got - want) < 0.02, (path, got, want)


def test_oracle_latent_beats_mcem_and_mixture(subset_dir):
    require_golden_models()
    for utt in ("sa2", "si494"):
        clean, fs = read_wav(f"{BASE}/Clean/test/34M/{utt}.wav")

        def score(path):
            deg, _ = read_wav(path)
            n = min(len(clean), len(deg))
            return pesq_wb(clean[:n], deg[:n], fs)

        mix = score(f"{BASE}/Noisy/Babble/-5/test/34M/{utt}.wav")
        for model in (M1, M2):
            full = score(f"{G}/{model}/ntcd_timit/Clean/test/34M/{utt}_s_est.wav")
            oracle = score(
                f"{G}/{model}/ntcd_timit/Clean/test/34M/{utt}_clean_z_nomcem_s_est.wav")
            assert oracle > full > mix, (utt, model, mix, full, oracle)


def test_monotone_in_snr():
    x = _speechlike()
    rng = np.random.default_rng(3)
    noise = rng.standard_normal(x.size)
    noise *= np.linalg.norm(x) / np.linalg.norm(noise)
    scores = [pesq_wb(x, x + noise * 10 ** (-snr / 20.0))
              for snr in (0.0, 10.0, 20.0, 30.0)]
    assert all(a < b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] < 2.0 and scores[-1] > 3.0, scores


def test_level_invariance():
    x = _speechlike()
    rng = np.random.default_rng(4)
    deg = x + 0.1 * rng.standard_normal(x.size)
    base = pesq_wb(x, deg)
    assert abs(pesq_wb(x, 8.0 * deg) - base) < 1e-6
    assert abs(pesq_wb(0.05 * x, deg) - base) < 1e-6


def test_delay_alignment():
    x = _speechlike()
    rng = np.random.default_rng(5)
    deg = x + 0.05 * rng.standard_normal(x.size)
    base = pesq_wb(x, deg)
    delayed = np.concatenate([np.zeros(801), deg])
    assert abs(pesq_wb(x, delayed) - base) < 0.1


def test_dispatcher_uses_native_without_wheel():
    from dvae_tpu.eval import pesq as pesq_mod

    if pesq_mod.pesq_wheel_available():
        pytest.skip("licensed wheel present; dispatcher prefers it")
    assert pesq_mod.pesq_available()
    x = _speechlike()
    assert abs(pesq_mod.pesq(16000, x, x, "wb") - 4.644) < 0.01
    # narrowband routes to the native P.862.1 scorer (max 4.549)
    assert abs(pesq_mod.pesq(16000, x, x, "nb") - 4.549) < 0.01
    with pytest.raises(ValueError, match="mode"):
        pesq_mod.pesq(16000, x, x, "ultra")


def test_narrowband_mode():
    """P.862.1 mapping anchors at the published maximum and stays monotone
    in SNR; resampling from 16 kHz input is internal."""
    from dvae_tpu.eval.pesq_native import pesq_nb

    x = _speechlike()
    assert abs(pesq_nb(x, x, 16000) - 4.549) < 0.01
    rng = np.random.default_rng(6)
    noise = rng.standard_normal(x.size)
    noise *= np.linalg.norm(x) / np.linalg.norm(noise)
    scores = [pesq_nb(x, x + noise * 10 ** (-snr / 20.0), 16000)
              for snr in (0.0, 15.0, 30.0)]
    assert scores[0] < scores[1] < scores[2], scores


def test_short_signal_raises_value_error():
    """run_metrics catches exactly ValueError to NaN-out one utterance
    without aborting the sweep — keep the contract."""
    with pytest.raises(ValueError, match="too short"):
        pesq_wb(np.zeros(100), np.zeros(100))
