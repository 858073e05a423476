"""Reference-signature figure functions (compat shim, matplotlib-native).

Matches /root/reference/packages/visualization.py:8-326: same function
names, parameter orders and defaults, frequency-major ``(n_bins, n_frames)``
inputs, the 1-row VAD broadcast trick, and the reference's value semantics
(``display_spectrogram`` plots raw amplitude unless ``convert_to_db``;
``display_power_spectro`` plots the values as given). Rendered with plain
matplotlib — ``librosa.display`` (the reference's renderer) is unavailable
here, and its ``waveplot`` was removed upstream anyway. dvae-tpu's own
analysis figures live in ``dvae_tpu.viz`` (frames-major API).
"""

from __future__ import annotations

import matplotlib

if matplotlib.get_backend().lower() not in ("agg", "pdf"):  # headless default
    matplotlib.use("Agg")
import matplotlib.gridspec as grd
import matplotlib.pyplot as plt
import numpy as np


def _amplitude_to_db(a, amin=1e-5, top_db=80.0):
    """librosa.core.amplitude_to_db with its defaults (ref=1.0): 20*log10
    clamped below at ``amin`` and to a ``top_db`` window under the peak."""
    db = 20.0 * np.log10(np.maximum(np.asarray(a, np.float64), amin))
    return np.maximum(db, db.max() - top_db) if db.size else db


def _specshow(values, fs, wlen_sec, hop_percent, vmin, vmax, cmap,
              xticks_sec, fontsize, ax=None):
    """Frequency-major image with the reference's time/kHz axes
    (visualization.py:90-105)."""
    values = np.asarray(values)
    frames = values.shape[1]
    hop_sec = int(hop_percent * int(wlen_sec * fs)) / fs
    time_sec = frames * hop_sec
    ax = ax or plt.gca()
    img = ax.imshow(values, origin="lower", aspect="auto", vmin=vmin,
                    vmax=vmax, cmap=cmap,
                    extent=[0, time_sec, 0, fs / 2 / 1e3])
    ax.set_ylabel("Frequency (kHz)", fontsize=fontsize + 10)
    ax.set_xlabel("Time (s)", fontsize=fontsize + 10)
    if time_sec > 0:
        ax.set_xticks(np.arange(0, time_sec, step=xticks_sec))
    ax.tick_params(labelsize=fontsize)
    return img


def display_waveplot(x, fs=16e3, ymax=1., ymin=-1., xticks_sec=1.0,
                     fontsize=50):
    """Waveform line plot on the current axes (visualization.py:8-42)."""
    x = np.asarray(x)
    time_sec = len(x) / fs
    ax = plt.gca()
    (img,) = ax.plot(np.arange(len(x)) / fs, x, linewidth=0.5)
    ax.set_ylabel("Amplitude", fontsize=fontsize + 10)
    ax.set_xlabel("Time (s)", fontsize=fontsize + 10)
    if time_sec > 0:
        ax.set_xticks(np.arange(0, time_sec, step=xticks_sec))
    ax.tick_params(labelsize=fontsize)
    ax.set_ylim(ymin=ymin, ymax=ymax)
    return img


def display_spectrogram(complex_spec, convert_to_db=False, fs=16e3, vmin=-60,
                        vmax=10, wlen_sec=50e-3, hop_percent=0.5,
                        xticks_sec=1.0, cmap="magma", fontsize=50):
    """Amplitude image of a frequency-major spectrogram; masks pass with
    ``convert_to_db=False, vmin=0, vmax=1`` exactly like the reference's
    call sites (visualization.py:44-105). A ``(1, frames)`` VAD row is
    broadcast to 513 bins (its :73-75 trick)."""
    amplitude = np.abs(np.asarray(complex_spec))
    if convert_to_db:
        amplitude = _amplitude_to_db(amplitude)
    if amplitude.shape[0] == 1:
        amplitude = np.repeat(amplitude, 513, axis=0)
    return _specshow(amplitude, fs, wlen_sec, hop_percent, vmin, vmax, cmap,
                     xticks_sec, fontsize)


def display_power_spectro(psd, fs=16e3, vmin=-60, vmax=10, wlen_sec=50e-3,
                          hop_percent=0.5, xticks_sec=1.0, cmap="magma",
                          fontsize=50):
    """Values plotted as given — callers pre-convert (visualization.py:107-155)."""
    return _specshow(np.asarray(psd), fs, wlen_sec, hop_percent, vmin, vmax,
                     cmap, xticks_sec, fontsize)


def _cbar(fig, gs_slot, img, fmt):
    ax = fig.add_subplot(gs_slot)
    plt.colorbar(img, cax=ax, format=fmt)


def display_wav_spectro_mask(x, x_tf, x_ibm, fs=16e3, vmin=-60, vmax=10,
                             wlen_sec=50e-3, hop_percent=0.5, xticks_sec=1.0,
                             fontsize=50):
    """Waveplot / dB spectrogram / mask column with per-image colorbars
    (visualization.py:157-199)."""
    fig = plt.figure(figsize=(20, 25))
    gs = grd.GridSpec(3, 2, height_ratios=[5, 10, 10], width_ratios=[10, 0.5],
                      wspace=0.1, hspace=0.3, left=0.08)
    plt.sca(fig.add_subplot(gs[0]))
    display_waveplot(x=x, fs=fs, xticks_sec=xticks_sec, fontsize=fontsize)
    plt.sca(fig.add_subplot(gs[2]))
    img = display_spectrogram(x_tf, True, fs, vmin, vmax, wlen_sec,
                              hop_percent, xticks_sec, "magma", fontsize)
    _cbar(fig, gs[3], img, "%+2.0f dB")
    plt.sca(fig.add_subplot(gs[4]))
    img = display_spectrogram(x_ibm, False, fs, 0, 1, wlen_sec, hop_percent,
                              xticks_sec, "Greys_r", fontsize)
    _cbar(fig, gs[5], img, "%0.1f")
    return fig


def display_multiple_signals(signal_list, fs=16e3, vmin=-60, vmax=10,
                             wlen_sec=50e-3, hop_percent=0.5, xticks_sec=1.0,
                             fontsize=50):
    """One column per ``[x, x_tf, x_ibm]`` triple, ``None`` skips a row
    (visualization.py:201-269)."""
    nb = len(signal_list)
    fig = plt.figure(figsize=(25 * nb, 25))
    gs = grd.GridSpec(3, 3 * nb, height_ratios=[5, 10, 10],
                      width_ratios=[10, 0.5, 2.0] * nb, wspace=0.1,
                      hspace=0.3, left=0.08)
    for i, (x, x_tf, x_ibm) in enumerate(signal_list):
        if x is not None:
            plt.sca(fig.add_subplot(gs[0, 3 * i]))
            display_waveplot(x=x, fs=fs, xticks_sec=xticks_sec,
                             fontsize=fontsize)
        if x_tf is not None:
            plt.sca(fig.add_subplot(gs[1, 3 * i]))
            img = display_spectrogram(x_tf, True, fs, vmin, vmax, wlen_sec,
                                      hop_percent, xticks_sec, "magma",
                                      fontsize)
            _cbar(fig, gs[1, 3 * i + 1], img, "%+2.0f dB")
        if x_ibm is not None:
            plt.sca(fig.add_subplot(gs[2, 3 * i]))
            img = display_spectrogram(x_ibm, False, fs, 0, 1, wlen_sec,
                                      hop_percent, xticks_sec, "Greys_r",
                                      fontsize)
            _cbar(fig, gs[2, 3 * i + 1], img, "%0.1f")
    return fig


def display_multiple_spectro(signal_list, fs=16e3, vmin=-60, vmax=10,
                             wlen_sec=50e-3, hop_percent=0.5, xticks_sec=1.0,
                             fontsize=50):
    """One column per ``[x, x_psd]`` pair: waveplot over power spectrogram
    (visualization.py:271-326)."""
    nb = len(signal_list)
    fig = plt.figure(figsize=(25 * nb, 16))
    gs = grd.GridSpec(2, 3 * nb, height_ratios=[5, 10],
                      width_ratios=[10, 0.5, 2.0] * nb, wspace=0.1,
                      hspace=0.3, left=0.08)
    for i, (x, x_psd) in enumerate(signal_list):
        if x is not None:
            plt.sca(fig.add_subplot(gs[0, 3 * i]))
            display_waveplot(x=x, fs=fs, xticks_sec=xticks_sec,
                             fontsize=fontsize)
        plt.sca(fig.add_subplot(gs[1, 3 * i]))
        img = display_power_spectro(x_psd, fs, vmin, vmax, wlen_sec,
                                    hop_percent, xticks_sec, "magma",
                                    fontsize)
        _cbar(fig, gs[1, 3 * i + 1], img, "%+2.0f dB")
    return fig
