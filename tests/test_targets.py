"""Label-generator parity: VAD/IBM targets must reproduce the shipped
reference fixtures bit-for-bit (data/subset/processed/.../*_labels*.h5)."""

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from dvae_tpu.data.io import read_wav
from dvae_tpu.ops.stft import StftConfig, stft
from dvae_tpu.ops.targets import (
    clean_speech_ibm,
    clean_speech_vad,
    noise_robust_clean_speech_ibm,
)

# Builder parametrization: create_audio_train_set.py:46-61 (center=False,
# 64 ms, 25% hop, vad_threshold=1.70, ibm_threshold=50)
CFG = StftConfig(center=False)


def test_vad_parity_vs_fixture(subset_dir):
    wav = subset_dir / "processed/ntcd_timit/Clean/test/34M/sa1.wav"
    fixture = subset_dir / "processed/ntcd_timit/Clean/test/34M/sa1_vad_labels_upsampled.h5"
    x, fs = read_wav(wav)
    assert fs == 16000
    vad = np.asarray(clean_speech_vad(jnp.asarray(x), CFG))
    with h5py.File(fixture, "r") as f:
        ref = f["Y"][:]
    assert ref.shape == (1, vad.shape[0])
    np.testing.assert_array_equal(vad, ref[0])


def test_ibm_parity_vs_fixture(subset_dir):
    # *_ibm_labels.h5 (non-upsampled builder also uses center=False per
    # create_train_set.py:46)
    wav = subset_dir / "raw/ntcd_timit/Clean/volunteers/01M/straightcam/sa1.wav"
    fixture = subset_dir / "processed/ntcd_timit/Clean/train/01M/sa1_ibm_labels.h5"
    x, fs = read_wav(wav)
    S = stft(jnp.asarray(x), CFG)
    ibm = np.asarray(clean_speech_ibm(S))
    with h5py.File(fixture, "r") as f:
        ref = f["Y"][:]
    # fixture layout is (freq, frames); ours is (frames, freq)
    if ref.shape == ibm.T.shape:
        mismatch = np.mean(ibm.T != ref)
        assert mismatch < 2e-3, f"IBM mismatch rate {mismatch}"
    else:
        pytest.skip(f"fixture shape {ref.shape} vs ours {ibm.shape} — different source wav")


def test_vad_shapes_and_range():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(20000).astype(np.float32)
    vad = np.asarray(clean_speech_vad(jnp.asarray(x), CFG))
    assert set(np.unique(vad)) <= {0.0, 1.0}


def test_noise_robust_ibm_is_gated():
    rng = np.random.default_rng(2)
    x = np.concatenate([np.zeros(8000), rng.standard_normal(12000)]).astype(np.float32)
    S = stft(jnp.asarray(x), CFG)
    vad = np.asarray(clean_speech_vad(jnp.asarray(x), CFG))
    nr = np.asarray(noise_robust_clean_speech_ibm(jnp.asarray(x), S, CFG))
    ibm = np.asarray(clean_speech_ibm(S))
    np.testing.assert_array_equal(nr, ibm * vad[:, None])
