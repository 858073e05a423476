"""Builder tests against the shipped subset fixtures: label h5 parity,
video h5 shape parity, frame-dataset schema parity."""

import h5py
import numpy as np
import pytest

from dvae_tpu.data import builders

from _helpers import PROC, RAW


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


def test_empirical_std_is_bessel_corrected():
    """All three reference builders use the 'empirical' (ddof=1) std with an
    explicit NB comment (create_video_train_files.py:355-357); small-n data
    discriminates it from the naive ddof=0 formula."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(17)
    n, s, sq = x.size, x.sum(), (x**2).sum()
    ours = builders._empirical_std(sq, s / n, n)
    np.testing.assert_allclose(ours, np.std(x, ddof=1), rtol=1e-12)
    assert abs(ours - np.std(x, ddof=0)) > 1e-3


def test_video_stats_accumulation_golden(subset_dir):
    """The shipped ntcd_timit_upsampled_statistics.h5 was produced by the
    reference's own builder over exactly the 3 shipped train utterances;
    re-accumulating them through our formula must land on the same scalars.
    (Bessel-vs-naive is below float32 accumulation noise at n=4.5e6 — the
    discriminating test is the small-n one above.)"""
    import glob

    files = sorted(glob.glob(
        str(subset_dir / "processed/ntcd_timit/matlab_raw/train/**/*_upsampled.h5"),
        recursive=True))
    assert len(files) == 3
    n, s, sq = 0, 0.0, 0.0
    for p in files:
        with h5py.File(p, "r") as f:
            X = np.asarray(f["X"])
        n += X.size
        s += float(X.sum())
        sq += float((X.astype(np.float64) ** 2).sum())
    mean = s / n
    std = builders._empirical_std(sq, mean, n)
    with h5py.File(subset_dir / "processed/ntcd_timit/matlab_raw/"
                   "ntcd_timit_upsampled_statistics.h5", "r") as f:
        ref_mean = float(np.asarray(f["X_train_mean"]).ravel()[0])
        ref_std = float(np.asarray(f["X_train_std"]).ravel()[0])
    np.testing.assert_allclose(mean, ref_mean, rtol=1e-5)
    np.testing.assert_allclose(std, ref_std, rtol=1e-5)


def test_build_train_pipeline_video_then_audio_stats(tmp_path, subset_dir):
    """Full train-split chain: build_video_files writes the upsampled videos
    + pixel stats, then build_audio_train_set trims each noisy log-power
    spectrogram to its utterance's video frame count before accumulating
    (reference create_audio_train_set.py:259-271,:333-338)."""
    builders.build_video_files(RAW, tmp_path, dataset_types=("train",))
    vstats = tmp_path / "ntcd_timit/matlab_raw/ntcd_timit_upsampled_statistics.h5"
    assert vstats.exists()
    with h5py.File(vstats) as f:
        mean = float(np.asarray(f["X_train_mean"]).ravel()[0])
        std = float(np.asarray(f["X_train_std"]).ravel()[0])
    # regenerated pixels differ from the shipped fixture by the x264
    # round-trip (see shape-parity test), so the golden comparison here is
    # loose — it still pins scale and formula end-to-end
    assert abs(mean - 125.224075) / 125.224075 < 0.02
    assert abs(std - 25.689972) / 25.689972 < 0.05

    builders.build_audio_train_set(RAW, tmp_path, dataset_types=("train",),
                                   labels="vad_labels", dataset_size="subset")
    astats = (tmp_path / "ntcd_timit/Noisy/"
              "ntcd_timit_log_power_spec_upsampled_statistics.h5")
    assert astats.exists()
    with h5py.File(astats) as f:
        amean = np.asarray(f["X_train_mean"])
        astd = np.asarray(f["X_train_std"])
    assert amean.shape == astd.shape
    assert np.all(np.isfinite(amean)) and np.all(np.isfinite(astd))
    assert np.all(astd > 0)
    # log power of normalized audio is negative on average
    assert amean.mean() < 0
    # noisy copies landed in the processed layout
    assert (tmp_path / "ntcd_timit/Noisy/Babble/-5/train/01M/sa1.wav").exists()


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
