"""Reconstruction analysis: encode-decode utterances and render figures.

Shared engine behind the reconstruct_* scripts (reference
scripts/reconstruct_M1.py etc.): read a wav, compute its power spectrogram,
run the VAE forward (optionally label-conditioned, optionally with swapped
labels — the disentanglement probe of reconstruct_M2.py:193-320), and plot
waveform / spectrogram / reconstruction side by side.
"""

from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu import viz
from dvae_tpu.ops.stft import StftConfig, stft
from dvae_tpu.ops.targets import clean_speech_vad


def power_spec(wav: np.ndarray, cfg: StftConfig = StftConfig()):
    S = np.asarray(stft(jnp.asarray(wav, jnp.float32), cfg))
    return S, np.abs(S) ** 2


def reconstruct(model, params, x2: np.ndarray, y: np.ndarray | None = None,
                key=None, sample: bool = True):
    """Forward pass -> reconstruction variance spectrogram (n_frames, 513)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    xs = jnp.asarray(x2, jnp.float32)
    if y is None:
        out = model.apply(params, xs, rngs={"sample": key}, sample=sample)
    else:
        out = model.apply(params, xs, jnp.asarray(y, jnp.float32),
                          rngs={"sample": key}, sample=sample)
    r = out[0]
    return np.asarray(r)


def label_variants(y: np.ndarray):
    """oracle / all-ones / all-zeros conditioning set (reconstruct_M2.py
    decodes with each to probe disentanglement)."""
    return {"y": y, "ones": np.ones_like(y), "zeros": np.zeros_like(y)}


def save_reconstruction_figure(out_path, wav, S, recon, vad=None,
                               cfg: StftConfig = StftConfig()):
    """Waveform + input spectrogram + sqrt-reconstruction (+ VAD mask row)."""
    fig = viz.display_multiple_signals([
        (wav, S, vad),
        (None, np.sqrt(np.maximum(recon, 0.0)), None),
    ], fs=cfg.fs, wlen_sec=cfg.wlen_sec, hop_percent=cfg.hop_percent)
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path)
    import matplotlib.pyplot as plt

    plt.close(fig)
    return out_path


def oracle_vad(wav: np.ndarray, cfg: StftConfig = StftConfig()):
    return np.asarray(clean_speech_vad(jnp.asarray(wav, jnp.float32), cfg))
