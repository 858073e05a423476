"""Bounded-memory long-form enhancement (dvae_tpu/enhance/longform.py).

Beyond-reference: the reference enhances one ≤6 s corpus utterance per
process; here arbitrarily long recordings run in input-independent device
memory — hop-aligned chunks enhanced as one ragged batch, overlaps
cross-faded with exactly-complementary ramps."""

from __future__ import annotations

import numpy as np
import pytest

from dvae_tpu.enhance.longform import (StreamingOverlapAdd, chunk_spans,
                                       enhance_chunked, overlap_add)
from dvae_tpu.ops.stft import StftConfig, n_stft_frames_clamped

CFG = StftConfig()  # 16 kHz, 1024 nfft, 256 hop


def _noisy_wav(seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * CFG.fs)) / CFG.fs
    x = 0.4 * np.sin(2 * np.pi * 210 * t) + 0.1 * rng.standard_normal(len(t))
    return x.astype(np.float32)


def test_chunk_spans_cover_and_align():
    n = int(5.3 * CFG.fs)
    spans = chunk_spans(n, CFG.fs, CFG.hop, 2.0, 0.5)
    assert spans[0][0] == 0 and spans[-1][1] == n
    ov = round(0.5 * CFG.fs / CFG.hop) * CFG.hop   # overlap in whole hops
    chunk = round(2.0 * CFG.fs / CFG.hop) * CFG.hop
    # EVERY span is chunk-length (bucket stability: one compiled bucket
    # serves all chunk items, incl. the tail)
    assert all(b - a == chunk for a, b in spans)
    for i, ((a, b), (a2, b2)) in enumerate(zip(spans, spans[1:])):
        assert a % CFG.hop == 0                   # regular starts aligned
        if i + 2 < len(spans):
            assert b - a2 == ov                   # uniform interior overlap
        else:
            assert b - a2 >= ov                   # final slides back
        assert a2 > a                             # strictly advancing
    # short inputs are a single span; bad overlap raises
    assert chunk_spans(CFG.fs, CFG.fs, CFG.hop, 2.0, 0.5) == [(0, CFG.fs)]
    with pytest.raises(ValueError, match="overlap"):
        chunk_spans(n, CFG.fs, CFG.hop, 1.0, 1.0)


def test_overlap_add_is_exact_partition_of_unity():
    """Feeding each chunk's own input back through the cross-fade must
    reproduce the signal bit-near-exactly — the fades sum to 1."""
    x = _noisy_wav(7.7)
    spans = chunk_spans(len(x), CFG.fs, CFG.hop, 2.0, 0.5)
    assert len(spans) >= 4
    out = overlap_add(spans, [x[a:b] for a, b in spans], len(x))
    np.testing.assert_allclose(out, x, atol=1e-6)
    # zero overlap = hard splice, also exact
    spans0 = chunk_spans(len(x), CFG.fs, CFG.hop, 2.0, 0.0)
    out0 = overlap_add(spans0, [x[a:b] for a, b in spans0], len(x))
    np.testing.assert_allclose(out0, x, atol=1e-6)


def test_streaming_overlap_add_matches_one_shot_bitwise():
    """The incremental accumulator IS the one-shot overlap_add: segments
    emitted after each piece concatenate bitwise-identically, each piece
    finalizes exactly the samples no later span can touch, and the union
    covers the signal."""
    x = _noisy_wav(7.7, seed=3)
    for chunk_s, ov_s in ((2.0, 0.5), (2.0, 0.0), (3.0, 1.5)):
        spans = chunk_spans(len(x), CFG.fs, CFG.hop, chunk_s, ov_s)
        rng = np.random.default_rng(1)
        pieces = [x[a:b] + 0.01 * rng.standard_normal(b - a) for a, b in spans]
        want = overlap_add(spans, pieces, len(x))
        acc = StreamingOverlapAdd(spans, len(x))
        segs, emitted = [], 0
        for i, p in enumerate(pieces):
            seg = acc.add(p)
            segs.append(seg)
            emitted += len(seg)
            # finalized frontier after piece i = the next span's start
            frontier = spans[i + 1][0] if i + 1 < len(spans) else len(x)
            assert emitted == frontier
        got = np.concatenate(segs)
        assert got.dtype == want.dtype and len(got) == len(want)
        np.testing.assert_array_equal(got, want)   # bitwise, not approx
    # misuse raises: extra piece, wrong shape
    acc = StreamingOverlapAdd(spans, len(x))
    for p in pieces:
        acc.add(p)
    with pytest.raises(ValueError, match="already added"):
        acc.add(pieces[-1])
    with pytest.raises(ValueError, match="want"):
        StreamingOverlapAdd(spans, len(x)).add(pieces[0][:-1])


class _FakeEnhancer:
    """Stands in for Enhancer: scales chunks, records the labels it saw."""

    class cfg:  # noqa: N801 - mimics EnhancerConfig attribute access
        stft = CFG

    def __init__(self):
        self.seen_ys = None
        self.call_sizes = []

    def enhance_batch(self, wavs, ys=None, key=None):
        self.call_sizes.append(len(wavs))
        if ys is not None:
            self.seen_ys = (self.seen_ys or []) + list(ys)
        return [(0.5 * w, 0.5 * w) for w in wavs]

    def enhance_stream(self, batches, key=None):
        # the real Enhancer pipelines dispatch-ahead; order and grouping
        # are what longform depends on
        for wavs, ys, _max_frames in batches:
            yield self.enhance_batch(wavs, ys)


def test_enhance_chunked_label_slicing_and_reassembly():
    x = _noisy_wav(6.1)
    n_frames = n_stft_frames_clamped(len(x), CFG)
    y = np.arange(n_frames, dtype=np.float32).reshape(-1, 1)  # frame index
    fake = _FakeEnhancer()
    s, n = enhance_chunked(fake, x, y=y, chunk_seconds=2.0,
                           overlap_seconds=0.5)
    np.testing.assert_allclose(s, 0.5 * x, atol=1e-6)
    np.testing.assert_allclose(n, 0.5 * x, atol=1e-6)
    spans = chunk_spans(len(x), CFG.fs, CFG.hop, 2.0, 0.5)
    assert len(fake.seen_ys) == len(spans)
    for (a, b), yc in zip(spans, fake.seen_ys):
        want_n = n_stft_frames_clamped(b - a, CFG)
        assert yc.shape == (want_n, 1)
        # frame k of the chunk is global frame a/hop + k (tail may
        # replicate the final label row for the boundary frame)
        off = a // CFG.hop
        m = min(want_n, n_frames - off)
        np.testing.assert_array_equal(yc[:m, 0], np.arange(off, off + m))
        assert (yc[m:, 0] == n_frames - 1).all()
    # labeler hook: called per dispatch group (bounded classifier batches,
    # same memory bound as the MCEM stage), covering every chunk once
    calls = []

    def labeler(ws):
        calls.append(len(ws))
        return [np.zeros((n_stft_frames_clamped(len(w), CFG), 1), np.float32)
                for w in ws]

    enhance_chunked(fake, x, labeler=labeler, chunk_seconds=2.0,
                    overlap_seconds=0.5, max_concurrent_chunks=2)
    assert sum(calls) == len(spans)
    assert all(c <= 2 for c in calls)
    with pytest.raises(ValueError, match="not both"):
        enhance_chunked(fake, x, y=y, labeler=labeler)
    # max_concurrent_chunks is THE memory bound: dispatch groups never
    # exceed it, and reassembly is unchanged
    fake2 = _FakeEnhancer()
    s2, _ = enhance_chunked(fake2, x, y=y, chunk_seconds=2.0,
                            overlap_seconds=0.5, max_concurrent_chunks=2)
    assert fake2.call_sizes == [2] * (len(spans) // 2) + (
        [len(spans) % 2] if len(spans) % 2 else [])
    assert len(fake2.seen_ys) == len(spans)
    np.testing.assert_allclose(s2, 0.5 * x, atol=1e-6)
    with pytest.raises(ValueError, match="max_concurrent_chunks"):
        enhance_chunked(fake, x, max_concurrent_chunks=0)


def test_enhance_chunked_real_engine_partition():
    """Real MCEM over chunks: the Wiener partition survives the cross-fade
    (s+n reconstructs the mixture), output length matches the input."""
    import jax

    from dvae_tpu.enhance.mcem import McemConfig
    from dvae_tpu.enhance.pipeline import Enhancer, EnhancerConfig
    from dvae_tpu.models import VAE, init_params

    model = VAE(h_dim=(16, 16), z_dim=4)
    params = init_params(
        model, {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        np.ones((4, 513), np.float32))
    enh = Enhancer(model, params, EnhancerConfig(
        mcem=McemConfig(niter=3, nsamples_e_step=2, burnin_e_step=2,
                        nsamples_wf=3, burnin_wf=3)))
    x = _noisy_wav(5.0)
    s, n = enhance_chunked(enh, x, chunk_seconds=2.0, overlap_seconds=0.5,
                           key=jax.random.PRNGKey(7))
    assert s.shape == x.shape == n.shape
    assert np.isfinite(s).all() and np.isfinite(n).all()
    resid = (s + n) - x
    corr = np.corrcoef(s + n, x)[0, 1]
    assert corr > 0.999, corr
    assert np.abs(resid).max() < 5e-2


def test_enhance_wav_cli_chunked(tmp_path):
    """--chunk-seconds end-to-end: long file in, full-length partition-
    correct outputs."""
    import os
    import pathlib
    import subprocess
    import sys

    import jax

    from dvae_tpu.data.io import read_wav, write_wav
    from dvae_tpu.models import VAE, init_params
    from dvae_tpu.train.checkpoint import save_checkpoint

    model = VAE(h_dim=(16, 16), z_dim=4)
    params = init_params(
        model, {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        np.ones((4, 513), np.float32))
    save_checkpoint(tmp_path, "M1_epoch_001_vloss_1.00", params)
    x = _noisy_wav(5.0)
    write_wav(tmp_path / "long.wav", x, CFG.fs)

    repo = pathlib.Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, str(repo / "scripts/enhance_wav.py"),
         str(tmp_path / "long.wav"),
         "--checkpoint", str(tmp_path / "M1_epoch_001_vloss_1.00.msgpack"),
         "--z-dim", "4", "--h-dim", "16", "16",
         "--niter", "3", "--nsamples-e-step", "2", "--burnin-e-step", "2",
         "--nsamples-wf", "3", "--burnin-wf", "3",
         "--chunk-seconds", "2", "--chunk-overlap", "0.5",
         "--output-dir", str(tmp_path / "out"), "--platform", "cpu"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr
    s, _ = read_wav(tmp_path / "out" / "long_s_est.wav")
    n, _ = read_wav(tmp_path / "out" / "long_n_est.wav")
    assert len(s) == len(x) == len(n)
    corr = np.corrcoef(s + n, x)[0, 1]
    assert corr > 0.999, corr
