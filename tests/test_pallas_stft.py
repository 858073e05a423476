"""Pallas STFT frontend kernel: interpreter-mode parity with the XLA path.

On the CPU test mesh the public entry points fall back to XLA; here we run
the actual kernel body through the Pallas interpreter to pin its semantics
(same window-folded DFT bases, same epilogue) against the reference-parity
XLA implementation in dvae_tpu.ops.stft.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dvae_tpu.ops.pallas_stft import _interpret_reference, _on_tpu
from dvae_tpu.ops.stft import StftConfig, log_power_spectrogram, power_spectrogram

CFG = StftConfig()


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(0)
    return (rng.standard_normal((2, 40960)) * 0.2).astype(np.float32)


def test_kernel_power_matches_xla(signal):
    got = np.asarray(_interpret_reference(jnp.asarray(signal), CFG, None))
    want = np.asarray(power_spectrogram(jnp.asarray(signal), CFG))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_kernel_log_power_matches_xla(signal):
    got = np.asarray(_interpret_reference(jnp.asarray(signal), CFG, 1e-12))
    want = np.asarray(log_power_spectrogram(jnp.asarray(signal), CFG))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kernel_ragged_rows(signal):
    # frame count not a multiple of the 256-row tile: padding must be inert
    x = jnp.asarray(signal[:1, :20480])
    got = np.asarray(_interpret_reference(x, CFG, None))
    want = np.asarray(power_spectrogram(x, CFG))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_public_entry_defaults_to_xla(signal):
    # the public API defaults to the XLA path (measured faster on v5e);
    # use_pallas=True off-TPU also falls back rather than failing
    import dvae_tpu.ops as ops

    assert not _on_tpu()
    got = np.asarray(ops.power_spectrogram(jnp.asarray(signal), CFG))
    want = np.asarray(power_spectrogram(jnp.asarray(signal), CFG))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got2 = np.asarray(ops.power_spectrogram(jnp.asarray(signal), CFG, use_pallas=True))
    np.testing.assert_allclose(got2, want, rtol=1e-6)
