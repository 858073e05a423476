"""Visual / audio-visual VAD classifiers (models/video_vad.py).

The reference consumed video-classifier VAD labels it could not produce
in-repo (its ``*_y_hat_hard.pt`` came from the sibling audio-visual-vad
repo, evaluate_ntcd_M2.py:85,180-189; in-repo only a commented
``VideoClassifier`` import and ``Video_Net_epoch_*`` checkpoint names
remain, train_audio_net.py:14,368-371). Contracts pinned here: model
shapes, batcher trim/mask semantics against the shipped subset fixtures,
and the tuple-input normalizer the AV fusion threads."""

from __future__ import annotations

import os

import jax
import numpy as np

from _helpers import PROC
from dvae_tpu.data.av_dataset import AudioVisualDataset, VideoDataset
from dvae_tpu.models import AVVad, VideoVad
from dvae_tpu.ops.stft import StftConfig
from dvae_tpu.train.sequence import (_seq_normalizer, batch_av_utterances,
                                     batch_video_utterances,
                                     make_lstm_vad_predict)


def _video_pairs():
    from dvae_tpu.data.catalog import ntcd_timit

    video_rel, _ = ntcd_timit.proc_video_audio_pair_dict(
        PROC + "/", "test", labels="vad_labels", upsampled=True)
    pairs = []
    for v in video_rel:
        lab = os.path.join(PROC, ntcd_timit.label_h5_rel(v))
        if os.path.exists(lab):
            pairs.append((os.path.join(PROC, v), lab))
    return pairs


def test_video_vad_shapes_and_finiteness():
    model = VideoVad(hidden=16, num_layers=2, emb_dim=8)
    v = np.random.default_rng(0).random((2, 12, 67, 67), np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, v)
    p = model.apply(params, v)
    assert p.shape == (2, 12)
    assert np.all(np.isfinite(np.asarray(p)))
    assert np.all((np.asarray(p) >= 0) & (np.asarray(p) <= 1))


def test_av_vad_uses_both_modalities():
    """The fusion output responds to each input stream independently —
    guards against a wiring slip that drops one modality."""
    model = AVVad(x_dim=33, hidden=16, num_layers=1, emb_dim=8)
    rng = np.random.default_rng(1)
    a = rng.standard_normal((1, 10, 33)).astype(np.float32)
    v = rng.random((1, 10, 67, 67)).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, (a, v))
    p0 = np.asarray(model.apply(params, (a, v)))
    p_a = np.asarray(model.apply(params, (a + 1.0, v)))
    p_v = np.asarray(model.apply(params, (a, v * 0.0)))
    assert p0.shape == (1, 10)
    assert not np.allclose(p0, p_a), "audio input ignored"
    assert not np.allclose(p0, p_v), "video input ignored"


def test_batch_video_utterances_trim_and_mask():
    pairs = _video_pairs()
    assert len(pairs) == 3  # shipped subset: test/34M x 3 utterances
    ds = VideoDataset(pairs)
    v0, y0 = ds[0]
    assert v0.shape[1:] == (67, 67) and len(v0) == len(y0)

    vb, yb, mb = batch_video_utterances(ds, range(len(ds)), pad_to_multiple=64)
    n_max = vb.shape[1]
    assert n_max % 64 == 0
    for j in range(len(ds)):
        n = len(ds[j][0])
        m = np.asarray(mb)[j]
        assert m[:n].all() and not m[n:].any()
        # padded frames are zeros (masked downstream)
        assert np.all(np.asarray(vb)[j, n:] == 0)
        np.testing.assert_array_equal(
            np.asarray(yb)[j, :n], ds[j][1].reshape(-1))


def test_batch_av_utterances_tuple_and_common_trim():
    from dvae_tpu.data.catalog import ntcd_timit

    nl = ntcd_timit.proc_noisy_clean_pair_dict(
        PROC + "/", "test", "subset", "vad_labels", upsampled=True)
    triples = []
    for noisy_rel, label_rel in nl.items():
        vid = os.path.join(PROC, ntcd_timit.video_h5_rel(label_rel))
        triples.append((os.path.join(PROC, noisy_rel), vid,
                        os.path.join(PROC, label_rel)))
    ds = AudioVisualDataset(triples)
    cfg = StftConfig(center=True)
    (a, v), yb, mb = batch_av_utterances(ds, range(2), cfg)
    assert a.shape[:2] == v.shape[:2] == yb.shape == mb.shape
    assert a.shape[2] == 513 and v.shape[2:] == (67, 67)
    # masked frame count == the dataset's common-trim length per item
    for j in range(2):
        _, vj, yj = ds[j]
        assert int(np.asarray(mb)[j].sum()) == min(len(vj), len(yj))


def test_seq_normalizer_tuple_inputs():
    """The AV norm tuple normalizes each stream with its own statistics;
    scalar (1,1) pixel stats broadcast over the (B,T,67,67) video."""
    rng = np.random.default_rng(2)
    a = rng.standard_normal((1, 5, 7)).astype(np.float32)
    v = (rng.random((1, 5, 4, 4)) * 255).astype(np.float32)
    a_norm = (rng.standard_normal(7).astype(np.float32),
              1.0 + rng.random(7).astype(np.float32))
    v_norm = (np.float32([[120.0]]), np.float32([[60.0]]))

    f = _seq_normalizer((a_norm, v_norm), eps=1e-8)
    na, nv = f((a, v))
    np.testing.assert_allclose(
        np.asarray(na), (a - a_norm[0]) / (a_norm[1] + 1e-8), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(nv), (v - 120.0) / (60.0 + 1e-8), rtol=1e-6)
    # None leaves a component untouched
    g = _seq_normalizer((None, v_norm), eps=1e-8)
    ga, _ = g((a, v))
    np.testing.assert_array_equal(np.asarray(ga), a)
    # the plain (mean, std) form still hits the single-array path
    h = _seq_normalizer(a_norm, eps=1e-8)
    np.testing.assert_allclose(np.asarray(h(a)),
                               (a - a_norm[0]) / (a_norm[1] + 1e-8), rtol=1e-6)


def test_av_predict_norm_matches_manual():
    """make_lstm_vad_predict with the tuple norm == applying the model to
    pre-normalized inputs (the contract predict_vad_labels --modality av
    relies on)."""
    model = AVVad(x_dim=9, hidden=8, num_layers=1, emb_dim=4)
    rng = np.random.default_rng(3)
    a = rng.standard_normal((2, 6, 9)).astype(np.float32)
    v = (rng.random((2, 6, 67, 67)) * 255).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, (a, v))
    a_norm = (np.zeros(9, np.float32), np.ones(9, np.float32))
    v_norm = (np.float32([[100.0]]), np.float32([[50.0]]))
    predict = make_lstm_vad_predict(model, norm=(a_norm, v_norm))
    p = np.asarray(predict(params, (a, v)))
    manual = np.asarray(model.apply(
        params, ((a - 0.0) / (1.0 + 1e-8), (v - 100.0) / (50.0 + 1e-8))))
    np.testing.assert_allclose(p, manual, atol=1e-6)
