"""Host-side audio / HDF5 I/O.

The reference uses soundfile (libsndfile) for wav I/O; this environment has
scipy only, so we implement the same float contract on top of
``scipy.io.wavfile``: reads return float64 in [-1, 1) (PCM scaled by
1/2**(bits-1)), writes store 16-bit PCM from float input (libsndfile-style
scale-by-32768 and clip).
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile

_PCM_SCALE = {np.dtype(np.int16): 1.0 / 32768.0, np.dtype(np.int32): 1.0 / 2147483648.0}


def wav_sample_rate(path) -> int:
    """Sample rate from the RIFF header alone (no data read).

    Walks the chunk list to the ``fmt `` chunk instead of assuming byte 24
    (files with LIST/JUNK chunks before fmt are valid RIFF). Lets callers
    fail fast on a rate mismatch across a large input list before any
    decode or device work (scripts/enhance_wav.py's pre-scan)."""
    import struct

    with open(path, "rb") as f:
        riff, _, wave = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                raise ValueError(f"{path}: no fmt chunk found")
            cid, size = struct.unpack("<4sI", hdr)
            if cid == b"fmt ":
                fmt = f.read(min(size, 16))
                return struct.unpack("<HHI", fmt[:8])[2]
            f.seek(size + (size & 1), 1)  # chunks are word-aligned


def read_wav(path) -> tuple[np.ndarray, int]:
    """Read a wav file -> (float64 samples in [-1, 1), sample rate)."""
    fs, data = wavfile.read(path)
    if data.dtype in _PCM_SCALE:
        data = data.astype(np.float64) * _PCM_SCALE[data.dtype]
    elif data.dtype == np.uint8:
        data = (data.astype(np.float64) - 128.0) / 128.0
    else:  # float32/float64 wavs
        data = data.astype(np.float64)
    return data, int(fs)


def resample(x: np.ndarray, fs_in: int, fs_out: int) -> np.ndarray:
    """Polyphase resample ``x`` from ``fs_in`` to ``fs_out`` Hz
    (``scipy.signal.resample_poly`` at the reduced up/down ratio). Shared
    by every serving surface that accepts non-model-rate audio."""
    from math import gcd

    from scipy.signal import resample_poly

    if fs_in == fs_out:
        return x
    g = gcd(int(fs_in), int(fs_out))
    return resample_poly(x, int(fs_out) // g, int(fs_in) // g)


def pcm16(data: np.ndarray) -> np.ndarray:
    """Float samples -> int16 PCM (libsndfile float->PCM_16 contract: scale
    by 32768 then lrint — round to nearest, ties to even — not floor, which
    would bias every written sample half an LSB low). The ONE quantization
    implementation behind write_wav and the streaming HTTP responses."""
    x = np.asarray(data, dtype=np.float64)
    return np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int16)


def write_wav(path, data: np.ndarray, fs: int) -> None:
    """Write float samples as 16-bit PCM (quantized by :func:`pcm16`)."""
    wavfile.write(path, fs, pcm16(data))
