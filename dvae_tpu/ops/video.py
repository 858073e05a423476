"""Lip-ROI video preprocessing (NTCD-TIMIT matlab DCT frames).

Parity with /root/reference/packages/processing/video.py:5-23 and the
builder's inline variant (create_video_train_files.py:146-172): each 67x67
frame is stored as 2-D DCT coefficients; preprocessing applies a 2-D
type-II IDCT (scipy.fftpack convention, unnormalized), a global min/max
normalization to [0, 255] computed over ALL frames of the utterance, a
270-degree rotation, an optional white-square VAD overlay, and channel
triplication.

TPU notes: the IDCT is two matmuls against a precomputed basis
(:func:`idct2`), jit/vmap-friendly; the host builders use the same code via
numpy inputs.

The reference upsamples 30 fps video to 62.5 fps (= 1/(wlen*hop) frames/s)
through an ffmpeg x264 encode/decode round-trip
(create_video_train_files.py:57-58,118-131). ffmpeg is not present in this
environment; :func:`upsample_frames` reproduces the fps-filter's
nearest-timestamp frame duplication directly (and losslessly — the x264
round-trip was lossy at crf>0).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _idct2_matrix(n: int) -> np.ndarray:
    """Unnormalized type-II IDCT matrix M s.t. idct(x) = M @ x
    (scipy.fftpack.idct(x, type=2, norm=None) convention:
    y[k] = x[0] + 2*sum_{j>=1} x[j] cos(pi j (2k+1) / (2n)))."""
    j = np.arange(n)[None, :]
    k = np.arange(n)[:, None]
    m = 2.0 * np.cos(np.pi * j * (2 * k + 1) / (2 * n))
    m[:, 0] = 1.0
    return m


def idct2(frames: jnp.ndarray) -> jnp.ndarray:
    """2-D unnormalized type-II IDCT over the last two axes.

    Equivalent to the reference's ``idct(idct(r).T).T`` (video.py:8), which
    applies scipy's idct along the LAST axis first, then the first.
    """
    h, w = frames.shape[-2], frames.shape[-1]
    mw = jnp.asarray(_idct2_matrix(w), dtype=frames.dtype)
    mh = jnp.asarray(_idct2_matrix(h), dtype=frames.dtype)
    out = jnp.einsum("...hw,kw->...hk", frames, mw)
    return jnp.einsum("...hk,mh->...mk", out, mh)


def preprocess_ntcd_matlab(matlab_frames, frame: int, width: int, height: int,
                           y_hat_hard=None, backend=np):
    """One preprocessed RGB lip frame, matching video.py:5-23.

    ``matlab_frames``: (n_frames, width*height) DCT coefficients.
    Normalization constants follow the reference exactly (video.py:9-13):
    the frame itself gets a true 2-D IDCT, but the normalization tensor A is
    idct(idct(frames)) along the LAST axis twice with NO transpose (not a
    2-D IDCT — the reference's own TODO comments mark it as provisional);
    offset = A.min() (global), scale = max over (frame, row) of A's
    row-wise max-min.
    """
    from scipy.fftpack import idct as _idct

    frames = np.asarray(matlab_frames, dtype=np.float64).reshape(-1, width, height)
    idct_df = np.asarray(idct2(jnp.asarray(frames[frame])))
    a_norm = _idct(_idct(frames))  # double idct along the last axis
    scale = (a_norm.max(axis=-1) - a_norm.min(axis=-1)).max()
    normalized = (idct_df - a_norm.min()) / scale * 255.0
    rotated = np.rot90(normalized, 3)
    if y_hat_hard is not None and y_hat_hard[frame] == 1:
        rotated = rotated.copy()
        rotated[-9:, -9:] = 255.0  # white square VAD overlay (video.py:18-19)
    return np.stack([rotated] * 3, axis=-1)


def preprocess_utterance(matlab_frames, width: int, height: int) -> np.ndarray:
    """All frames of an utterance -> (n_frames, height, width) float32 in
    [0, 255] (the builder's batch path, create_video_train_files.py:158-172,
    single channel)."""
    frames = np.asarray(matlab_frames, dtype=np.float64).reshape(-1, width, height)
    A = np.asarray(idct2(jnp.asarray(frames)))
    scale = (A.max(axis=(-2, -1)) - A.min(axis=(-2, -1))).max()
    normalized = (A - A.min()) / scale * 255.0
    # the reference's video-codec round-trip clamps to the 8-bit pixel range;
    # its normalization can exceed 255 when the brightest frame has a high min
    normalized = np.clip(normalized, 0.0, 255.0)
    return np.rot90(normalized, 3, axes=(-2, -1)).astype(np.float32)


def upsample_frames(frames: np.ndarray, fps_in: float, fps_out: float,
                    n_out: int | None = None) -> np.ndarray:
    """Nearest-timestamp frame duplication (ffmpeg's fps filter semantics
    for pure upsampling). ``frames``: (n_frames, ...)."""
    n_in = frames.shape[0]
    if n_out is None:
        n_out = int(round(n_in * fps_out / fps_in))
    t_out = np.arange(n_out) / fps_out
    idx = np.clip(np.round(t_out * fps_in).astype(int), 0, n_in - 1)
    return frames[idx]
