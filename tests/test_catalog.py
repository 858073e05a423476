"""Catalog parity: our path builders must emit exactly the reference's
outputs on the shipped subset tree (oracle = the reference module itself,
importable as it only uses stdlib)."""

import sys

import pytest

from dvae_tpu.data.catalog import ntcd_timit as ours


@pytest.fixture(scope="module")
def ref(subset_dir):
    sys.path.insert(0, "/root/reference")
    from packages.dataset import ntcd_timit as ref_mod

    return ref_mod


RAW = "/root/reference/data/subset/raw/"
PROC = "/root/reference/data/subset/processed/"


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
@pytest.mark.parametrize("upsampled", [True, False])
def test_proc_noisy_clean_pair_dict_parity(ref, split, upsampled):
    assert ours.proc_noisy_clean_pair_dict(PROC, split, "subset", "vad_labels", upsampled) == \
        ref.proc_noisy_clean_pair_dict(PROC, split, "subset", "vad_labels", upsampled)


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
