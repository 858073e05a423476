"""Catalog parity: our path builders must emit exactly the reference's
outputs on the shipped subset tree (oracle = the reference module itself,
importable as it only uses stdlib)."""

import os
import sys

import numpy as np
import pytest

from dvae_tpu.data.catalog import ntcd_timit as ours


@pytest.fixture(scope="module")
def ref(subset_dir):
    sys.path.insert(0, "/root/reference")
    from packages.dataset import ntcd_timit as ref_mod

    return ref_mod


import _helpers

RAW = _helpers.RAW + "/"   # the catalog functions expect trailing slashes
PROC = _helpers.PROC + "/"


@pytest.mark.parametrize("split", ["train", "validation", "test"])
def test_video_list_parity(ref, split):
    assert ours.video_list(RAW, split) == ref.video_list(RAW, split)


@pytest.mark.parametrize("split", ["train", "validation", "test"])
def test_speech_list_parity(ref, split):
    assert ours.speech_list(RAW, split) == ref.speech_list(RAW, split)


@pytest.mark.parametrize("split", ["train", "test"])
@pytest.mark.parametrize("size", ["subset", "complete"])
def test_noisy_speech_dict_parity(ref, split, size):
    assert ours.noisy_speech_dict(RAW, split, size) == ref.noisy_speech_dict(RAW, split, size)


@pytest.mark.parametrize("split", ["train", "test"])
@pytest.mark.parametrize("size", ["subset", "complete"])
def test_noisy_clean_pair_dict_parity(ref, split, size):
    assert ours.noisy_clean_pair_dict(RAW, split, size) == ref.noisy_clean_pair_dict(RAW, split, size)


@pytest.mark.parametrize("split", ["train", "test"])
@pytest.mark.parametrize("size", ["subset", "complete"])
@pytest.mark.parametrize("upsampled", [True, False])
def test_proc_noisy_clean_pair_dict_parity(ref, split, size, upsampled):
    # complete mode is non-trivial on the shipped tree too: the full
    # noise-type x SNR grid globs 90 pairs for (test, upsampled) and
    # (train, plain) — both engines must agree on all four combinations
    assert ours.proc_noisy_clean_pair_dict(PROC, split, size, "vad_labels", upsampled) == \
        ref.proc_noisy_clean_pair_dict(PROC, split, size, "vad_labels", upsampled)


@pytest.mark.parametrize("upsampled", [True, False])
def test_proc_video_audio_pair_dict_parity(ref, upsampled):
    assert ours.proc_video_audio_pair_dict(PROC, "train", "vad_labels", upsampled) == \
        ref.proc_video_audio_pair_dict(PROC, "train", "vad_labels", upsampled)


def test_kaldi_list_shapes(tmp_path):
    """kaldi_list returns sorted relative (ark, scp) lists for the
    kaldi_fMLLR tree (reference ntcd_timit.py:57-96); the shipped subset has
    no kaldi tree, so build a miniature one."""
    from dvae_tpu.data.catalog.ntcd_timit import kaldi_list

    d = tmp_path / "ntcd_timit" / "kaldi_fMLLR" / "train"
    (d / "09F").mkdir(parents=True)
    (d / "09F" / "b.ark").write_bytes(b"")
    (d / "09F" / "a.ark").write_bytes(b"")
    (d / "09F" / "a.scp").write_text("")
    ark, scp = kaldi_list(str(tmp_path), "train")
    assert ark == ["ntcd_timit/kaldi_fMLLR/train/09F/a.ark",
                   "ntcd_timit/kaldi_fMLLR/train/09F/b.ark"]
    assert scp == ["ntcd_timit/kaldi_fMLLR/train/09F/a.scp"]
    assert kaldi_list(str(tmp_path), "test") == ([], [])


def _load_reference_noise_module(name):
    """A reference noise catalog as an oracle (shared stub installer in
    _helpers keeps 'packages' a real package and never clobbers librosa
    attributes other oracle loaders rely on)."""
    from _helpers import load_reference_module

    return load_reference_module(f"packages/dataset/{name}.py")


def _fake_qut_tree(root):
    for sub, f in (("cafe", "CAFE-CAFE-1.wav"), ("car", "CAR-WINDOWNB-1.wav"),
                   ("home", "HOME-KITCHEN-1.wav"), ("street", "STREET-CITY-1.wav"),
                   ("cafe", "CAFE-FOODCOURTB-2.wav")):
        d = root / sub
        d.mkdir(exist_ok=True)
        (d / f).write_bytes(b"")


def test_qut_noise_list_matches_reference(tmp_path):
    from dvae_tpu.data.catalog import qut

    ref = _load_reference_noise_module("qut_database")
    _fake_qut_tree(tmp_path)
    want = ref.noise_list(str(tmp_path) + "/", "test")
    got = qut.noise_list(str(tmp_path), "test")
    assert set(got) == set(want) == {"cafe", "car", "home", "street"}
    for k in got:
        assert os.path.basename(got[k]) == os.path.basename(want[k])


def test_qut_preprocess_noise_semantics():
    """First channel, polyphase resample, car trim window — and unlike the
    reference (qut_database.py:75-77, which leaves noise_audio_resamp
    unbound when fs == fs_noise), the no-resample path works."""
    from dvae_tpu.data.catalog import qut

    rng = np.random.default_rng(0)
    stereo = rng.standard_normal((32000, 2)).astype(np.float32)
    out = qut.preprocess_noise(stereo, "cafe", 32000, 16000)
    assert out.ndim == 1 and abs(len(out) - 16000) <= 1

    # the trim window scales with fs — test at 1 kHz so the fixture is
    # ~2.6M samples instead of 48M (same code path, same assertions)
    fs_small = 1000
    mono = np.arange(fs_small * 60 * 50, dtype=np.float32)
    car = qut.preprocess_noise(mono, "car", fs_small, fs_small)
    assert len(car) == int(43 * 60 * fs_small) - int(1.5 * 60 * fs_small)
    np.testing.assert_array_equal(car[:8], mono[int(1.5 * 60 * fs_small):][:8])


def test_qut_noise_segment_crops_speech_length():
    from dvae_tpu.data.catalog import qut

    noises = {"cafe": np.arange(10_000, dtype=np.float32)}
    speech = np.zeros(400)
    seg = qut.noise_segment(noises, "cafe", speech, rng=np.random.default_rng(3))
    assert len(seg) == 400
    assert float(seg[1] - seg[0]) == 1.0  # contiguous crop
    with pytest.raises(KeyError):
        qut.noise_segment(noises, "disco", speech)


def test_demand_noise_list_matches_reference(tmp_path):
    from dvae_tpu.data.catalog import demand

    ref = _load_reference_noise_module("demand_database")
    for folder in ("DWASHING", "NRIVER", "OOFFICE", "TMETRO", "NFIELD"):
        d = tmp_path / folder
        d.mkdir()
        (d / "ch01.wav").write_bytes(b"")
        (d / "ch02.wav").write_bytes(b"")
    want = ref.noise_list(str(tmp_path) + "/", "train")
    got = demand.noise_list(str(tmp_path), "train")
    assert set(got) == set(want) == {"domestic", "nature", "office",
                                     "transportation"}
    for k in got:
        assert set(got[k]) == set(want[k])  # same sample ids
        for sid in got[k]:
            assert os.path.basename(got[k][sid]) == os.path.basename(want[k][sid])


def test_demand_noise_list_preprocessed_matches_reference(tmp_path):
    """Defined splits match the reference's glob exactly; the undefined
    'test' split raises here instead of the reference's print-then-glob-
    the-unsplit-root (demand_database.py:106-112)."""
    from dvae_tpu.data.catalog import demand

    ref = _load_reference_noise_module("demand_database")
    for split_dir, stem in (("si_tr_s/env1", "tr_a"), ("si_tr_s/env2", "tr_b"),
                            ("si_dt_05/env1", "dt_a")):
        d = tmp_path / split_dir
        d.mkdir(parents=True)
        (d / f"{stem}.wav").write_bytes(b"")
    for split in ("train", "validation"):
        want = ref.noise_list_preprocessed(str(tmp_path) + "/", split)
        got = demand.noise_list_preprocessed(str(tmp_path), split)
        assert set(got) == set(want)
        for k in got:
            assert os.path.basename(got[k]) == os.path.basename(want[k])
    with pytest.raises(NotImplementedError):
        demand.noise_list_preprocessed(str(tmp_path), "test")
