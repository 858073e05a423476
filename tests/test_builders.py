"""Builder tests against the shipped subset fixtures: label h5 parity,
video h5 shape parity, frame-dataset schema parity."""

import h5py
import numpy as np
import pytest

from dvae_tpu.data import builders

RAW = "/root/reference/data/subset/raw"
PROC = "/root/reference/data/subset/processed"


def test_build_audio_train_set_vad_parity(tmp_path, subset_dir):
    builders.build_audio_train_set(RAW, tmp_path, dataset_types=("test",),
                                   labels="vad_labels", dataset_size="subset")
    ours = tmp_path / "ntcd_timit/Clean/test/34M/sa1_vad_labels_upsampled.h5"
    ref = subset_dir / "processed/ntcd_timit/Clean/test/34M/sa1_vad_labels_upsampled.h5"
    with h5py.File(ours) as a, h5py.File(ref) as b:
        ya, yb = a["Y"][:], b["Y"][:]
    assert ya.shape == yb.shape
    np.testing.assert_array_equal(ya, yb)
    # noisy copies landed in the processed layout
    assert (tmp_path / "ntcd_timit/Noisy/Babble/-5/test/34M/sa1.wav").exists()


def test_build_video_files_shape_parity(tmp_path, subset_dir):
    builders.build_video_files(RAW, tmp_path, dataset_types=("test",))
    ours = tmp_path / "ntcd_timit/matlab_raw/test/34M/sa1_upsampled.h5"
    ref = subset_dir / "processed/ntcd_timit/matlab_raw/test/34M/sa1_upsampled.h5"
    with h5py.File(ours) as a, h5py.File(ref) as b:
        xa, xb = a["X"], b["X"]
        assert xa.shape == xb.shape, (xa.shape, xb.shape)
        assert xa.dtype == xb.dtype
        va = xa[:]
    assert va.min() >= 0 and va.max() <= 255.001
    # pixel parity vs the fixture is approximate: the reference round-trips
    # through an x264 encode (RGB<->YUV) and ffmpeg's fps filter may pick
    # neighboring source frames at duplication boundaries
    with h5py.File(ref) as b:
        vb = b["X"][:]
    assert np.abs(va - vb).mean() < 5.0
    assert np.corrcoef(va.ravel(), vb.ravel())[0, 1] > 0.95
    # label h5 written alongside
    assert (tmp_path / "ntcd_timit/Clean/test/34M/sa1_vad_labels_upsampled.h5").exists()


def test_build_frame_dataset_schema(tmp_path, subset_dir):
    out = builders.build_frame_dataset(RAW, tmp_path, labels="ibm_labels",
                                       dataset_types=("train", "validation"),
                                       proc_video_dir=PROC + "/",
                                       legacy_video_trim=True)
    ref = subset_dir / "processed/ntcd_timit/Clean_ibm_labels_upsampled.h5"
    with h5py.File(out) as a, h5py.File(ref) as b:
        for key in ("X_train", "Y_train", "X_validation", "Y_validation",
                    "X_train_mean", "X_train_std"):
            assert key in a, key
            assert a[key].shape[0] == b[key].shape[0], key
            assert a[key].dtype == b[key].dtype
        # the fixture's frame count per split (201) should match ours if the
        # builder's trimming logic agrees
        assert a["X_train"].shape == b["X_train"].shape
        np.testing.assert_allclose(a["X_train"][:], b["X_train"][:], rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(a["Y_train"][:], b["Y_train"][:])


def test_copy_ntcd_noisy_test(tmp_path, subset_dir):
    n = builders.copy_ntcd_noisy_test(RAW, tmp_path, "test", "subset")
    assert n == 6  # Babble,LR x -5 x {sa1,sa2,si494}
    assert (tmp_path / "ntcd_timit/Noisy/LR/-5/test/34M/si494.wav").exists()


def test_audio_visual_dataset(subset_dir):
    """AudioVisualDataset: audio/video/labels trimmed to the common frame
    count (reference data_handling.py:225-334 semantics)."""
    from dvae_tpu.data.av_dataset import AudioVisualDataset

    proc = subset_dir / "processed/ntcd_timit"
    wav = proc / "Noisy/Babble/-5/test/34M/sa1.wav"
    video = proc / "matlab_raw/test/34M/sa1_upsampled.h5"
    label = proc / "Clean/test/34M/sa1_vad_labels_upsampled.h5"
    import pytest as _pytest

    if not (wav.exists() and video.exists() and label.exists()):
        _pytest.skip("subset fixture files missing")
    ds = AudioVisualDataset([(wav, video, label)])
    x, v, y = ds[0]
    assert v.shape[1:] == (67, 67)
    assert v.shape[0] == y.shape[0]  # common frame count
    n = v.shape[0]
    assert len(x) >= (n - 1) * 256 + 1024  # audio yields >= n frames
    assert np.abs(x).max() <= 1.0 + 1e-6  # peak-normalized
    # consumer contract: spectrogram frames sliced to the label count
    from dvae_tpu.ops.stft import StftConfig, n_stft_frames

    assert n_stft_frames(len(x), StftConfig()) >= n
