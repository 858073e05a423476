"""Bounded-memory enhancement of arbitrarily long audio.

The MCEM engine is length-agnostic (masked batching, no sequence cap —
120 s one-shot is verified on-chip), but device memory grows linearly with
frames: the chain keeps |X|², the NMF planes and the emitted Vs-sample
stack resident, so hour-scale audio in ONE dispatch would exhaust HBM.
:func:`enhance_chunked` bounds memory by input-independent constants:

* the waveform splits into hop-aligned chunks of ``chunk_seconds`` with a
  short ``overlap_seconds`` cross-fade region (at most half a chunk — the
  complementary fades assume two-deep coverage);
* chunks dispatch in groups of ``max_concurrent_chunks`` through
  :meth:`Enhancer.enhance_stream`, which keeps ``pipeline_depth`` groups
  in flight — the chip stays busy across a remote link while resident
  memory stays at depth × group × chunk, independent of file length;
* overlaps cross-fade in the time domain with complementary raised-cosine
  ramps that sum to EXACTLY 1, so the Wiener partition survives: each
  chunk's ``s+n`` reconstructs its mixture span, and the blend of two
  reconstructions of the same span is still that span (pinned by a
  fake-enhancer identity test).

Per-chunk MCEM re-fits the NMF noise model (W, H, g) from scratch — for
noise that drifts over minutes this tracks better than one global fit.
The reference never faced any of this: its utterances are ≤ ~6 s
(evaluate_ntcd_M1.py processes one short file at a time).

Labels: chunk boundaries are multiples of the STFT hop, so frame ``k`` of
the chunk starting at sample ``a`` is global frame ``a/hop + k`` — a full-
length label array slices per chunk by that offset (the boundary frame
whose window straddles the cut replicates the last available row). For
self-labeling models pass ``labeler`` instead (called once with the chunk
list; e.g. ``labeling.self_soft_labels`` — one batched classifier call).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import numpy as np

from dvae_tpu.ops.stft import n_stft_frames_clamped


def chunk_spans(n_samples: int, fs: int, hop: int, chunk_seconds: float,
                overlap_seconds: float) -> list[tuple[int, int]]:
    """Hop-aligned [start, end) spans covering [0, n_samples).

    EVERY span has the same length (``chunk``) when the signal is longer
    than one chunk: the final span slides BACK to ``[n - chunk, n]``
    instead of ending short. Equal lengths are the bucket-stability
    contract — all chunk items land in ONE compiled frame bucket, so a
    warm server/engine never pays a mid-request cold compile for an
    odd-length tail (the tail's extra overlap with its predecessor is
    handled exactly by :func:`overlap_add`'s weight normalization).
    Interior overlap is ``overlap_seconds`` rounded to whole hops."""
    if n_samples <= 0:
        raise ValueError("empty signal")
    chunk = max(hop, int(round(chunk_seconds * fs / hop)) * hop)
    ov = int(round(overlap_seconds * fs / hop)) * hop
    # at most TWO chunks may cover any sample (the cross-fades are
    # pairwise): overlap may not exceed half the chunk (ov <= step)
    if ov < 0 or 2 * ov > chunk:
        raise ValueError(
            f"overlap {overlap_seconds}s must be at most half the chunk "
            f"{chunk_seconds}s (got {ov} vs chunk {chunk} samples)")
    if n_samples <= chunk:
        return [(0, n_samples)]
    step = chunk - ov
    spans, a = [], 0
    while a + chunk < n_samples:
        spans.append((a, a + chunk))
        a += step
    # the final span is exactly chunk-length ending at n: its start is
    # hop-aligned only when n is, so label slicing rounds its frame
    # offset to the nearest frame (<= half-frame shift on ONE chunk);
    # audio reassembly is sample-exact regardless
    spans.append((n_samples - chunk, n_samples))
    return spans


def _fade_in(ov: int) -> np.ndarray:
    """Raised-cosine ramp; paired as (ramp, 1-ramp) so overlaps sum to 1."""
    k = np.arange(ov, dtype=np.float64)
    return np.sin(0.5 * math.pi * (k + 0.5) / ov) ** 2


class StreamingOverlapAdd:
    """Incremental :func:`overlap_add`: feed pieces IN SPAN ORDER, get back
    the newly-FINALIZED samples after each one.

    Spans have strictly increasing starts (the :func:`chunk_spans`
    contract), so once piece ``i`` has been blended, every sample before
    ``spans[i+1][0]`` can never be touched again — that prefix is final and
    can leave the process (e.g. onto an HTTP socket) while later chunks are
    still on the device. The concatenation of the
    emitted segments is bitwise-identical to the one-shot
    :func:`overlap_add` result (same buffers, same arithmetic — pinned in
    tests/test_longform.py)."""

    def __init__(self, spans: Sequence[tuple[int, int]], n_samples: int):
        self.spans = list(spans)
        self.n_samples = n_samples
        self._out = np.zeros(n_samples, np.float64)
        self._weight = np.zeros(n_samples, np.float64)
        self._next = 0       # index of the piece expected next
        self._emitted = 0    # samples already finalized

    def add(self, piece: np.ndarray) -> np.ndarray:
        """Blend the next span's output; return the newly-final float32
        samples (possibly empty — a successor can start before the
        previously-finalized frontier when overlaps differ)."""
        i = self._next
        if i >= len(self.spans):
            raise ValueError("all spans already added")
        a, b = self.spans[i]
        piece = np.asarray(piece, np.float64)
        if piece.shape != (b - a,):
            raise ValueError(f"chunk {i}: got {piece.shape}, want {(b - a,)}")
        fade = np.ones(b - a, np.float64)
        if i > 0:
            ov = self.spans[i - 1][1] - a     # head overlap with predecessor
            if ov > 0:
                fade[:ov] = _fade_in(min(ov, b - a))[:ov]
        if i + 1 < len(self.spans):
            ov = b - self.spans[i + 1][0]     # tail overlap with successor
            if ov > 0:
                fade[-ov:] = (1.0 - _fade_in(min(ov, b - a)))[-ov:]
        self._out[a:b] += piece * fade
        self._weight[a:b] += fade
        self._next += 1
        final = (self.spans[i + 1][0] if self._next < len(self.spans)
                 else self.n_samples)
        final = max(final, self._emitted)
        seg_w = self._weight[self._emitted:final]
        if (seg_w <= 0).any():
            raise ValueError("uncovered or zero-weight samples in overlap_add")
        seg = (self._out[self._emitted:final] / seg_w).astype(np.float32)
        self._emitted = final
        return seg


def overlap_add(spans: Sequence[tuple[int, int]],
                pieces: Sequence[np.ndarray], n_samples: int) -> np.ndarray:
    """Cross-fade chunk outputs back into one signal.

    Interior overlaps use complementary raised-cosine pairs; the final
    chunk's (larger) overlap with its predecessor can make a fade pair
    non-complementary, so the blend is explicitly weight-normalized —
    a convex combination at every sample, which is what preserves the
    Wiener partition: each chunk's ``s+n`` reconstructs its mixture span,
    and any convex blend of reconstructions of the same span is still
    that span. (One implementation: this is the streaming accumulator
    run to completion.)"""
    if len(pieces) != len(spans):
        raise ValueError(f"{len(pieces)} pieces for {len(spans)} spans")
    if not pieces:
        raise ValueError("uncovered or zero-weight samples in overlap_add")
    acc = StreamingOverlapAdd(spans, n_samples)
    return np.concatenate([acc.add(p) for p in pieces])


def enhance_chunked(enhancer, wav: np.ndarray, y: np.ndarray | None = None,
                    chunk_seconds: float = 60.0,
                    overlap_seconds: float = 1.0, key=None,
                    labeler: Callable | None = None,
                    max_concurrent_chunks: int = 4,
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Enhance one long waveform in bounded device memory.

    Args:
        enhancer: a warm :class:`~dvae_tpu.enhance.pipeline.Enhancer`.
        wav: float waveform at the enhancer's sample rate.
        y: full-length (n_frames, y_dim) labels for conditional models —
            sliced per chunk by hop offset (short tails replicate the last
            row for the boundary frame).
        labeler: alternative to ``y``: called once PER DISPATCH GROUP with
            that group's chunk waveforms, returns per-chunk label arrays
            (the self-soft hook) — per-group so the classifier batch obeys
            the same memory bound as the MCEM stage.
        key: optional PRNG key (chunk groups fold independent streams).
        max_concurrent_chunks: device batch cap PER DISPATCH — the memory
            bound: resident state is ``pipeline_depth``
            (EnhancerConfig, dispatch-ahead) × max_concurrent_chunks ×
            chunk_seconds of audio, independent of input length
            (enhance_batch alone would batch up to ``max_device_batch``
            chunks = 32×60 s resident at the defaults, more than most
            one-shot inputs).
    Returns:
        (s_hat, n_hat) float32 waveforms of ``len(wav)`` — the usual
        Wiener-complementary pair (their sum reconstructs ``wav``).
    """
    if y is not None and labeler is not None:
        raise ValueError("pass y or labeler, not both")
    cfg = enhancer.cfg.stft
    wav = np.asarray(wav, np.float32)
    spans = chunk_spans(len(wav), cfg.fs, cfg.hop, chunk_seconds,
                        overlap_seconds)
    wavs = [wav[a:b] for a, b in spans]
    ys = None
    if y is not None:
        y = np.asarray(y, np.float32)
        ys = []
        for (a, b), w in zip(spans, wavs):
            # nearest frame: every start is hop-aligned except possibly the
            # final full-length span (chunk_spans), where the grid shifts
            # by < half a frame
            off = (a + cfg.hop // 2) // cfg.hop
            n = n_stft_frames_clamped(len(w), cfg)
            yc = y[off:off + n]
            if len(yc) < n:            # boundary frame past the label tail
                if len(y) == 0:
                    raise ValueError("empty label array")
                yc = np.concatenate(
                    [yc, np.repeat(y[-1:], n - len(yc), axis=0)])
            ys.append(yc)
    if max_concurrent_chunks < 1:
        raise ValueError("max_concurrent_chunks must be >= 1")

    def groups():
        for g in range(0, len(wavs), max_concurrent_chunks):
            h = g + max_concurrent_chunks
            if labeler is not None:
                yg = list(labeler(wavs[g:h]))   # per-group: bounded batch
            else:
                yg = None if ys is None else ys[g:h]
            yield wavs[g:h], yg, None

    # enhance_stream keeps pipeline_depth groups in flight (upload +
    # dispatch overlap device compute), so the RTT of a remote-attached
    # chip hides behind the previous group's execution
    outs = []
    for out in enhancer.enhance_stream(groups(), key=key):
        outs.extend(out)
    s = overlap_add(spans, [o[0] for o in outs], len(wav))
    n = overlap_add(spans, [o[1] for o in outs], len(wav))
    return s, n
