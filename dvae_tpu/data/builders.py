"""Dataset builders (host-side): the create_* pipeline of the reference.

Each builder mirrors one reference script's outputs byte-contract-for-
byte-contract (HDF5 keys/shapes/dtypes, wav layouts, stats files):

* :func:`build_video_files`      — create_video_train_files.py: lip-ROI .mat
  -> IDCT/normalize/rotate -> 62.5 fps upsample -> ``<utt>_upsampled.h5``
  ('X' (67, 67, frames) float32) + train pixel-stats h5.
* :func:`build_audio_train_set`  — create_audio_train_set.py: copy clean
  wavs, per-utterance label h5 ('Y' (y_dim, frames)); copy noisy wavs +
  train noisy log-power statistics h5.
* :func:`build_frame_dataset`    — create_train_set.py: consolidated
  frame-level ``Clean_<labels>_upsampled.h5`` with X_<split> (513, N) linear
  power spectra (lzf, chunks (513, 1)) + train mean/std.
* :func:`build_qut_test_set`     — create_test_set.py: QUT-noise mixtures at
  random SNRs, ``_s/_n/_x.wav`` triplets + pickled SNR list.
* :func:`copy_ntcd_noisy_test`   — create_audio_set_ntcd_noise.py: relayout
  of the pre-mixed Noisy_TCDTIMIT wavs.

STFT/label computation runs through the jit'd jnp ops (on CPU or TPU);
file I/O fans out over thread pools like the reference's executors.
"""

from __future__ import annotations

import concurrent.futures
import os
import pathlib
import pickle
import shutil

import h5py
import jax.numpy as jnp
import numpy as np

from dvae_tpu.data import catalog
from dvae_tpu.data.io import read_wav, write_wav
from dvae_tpu.ops.stft import StftConfig, power_spectrogram, stft
from dvae_tpu.ops.targets import clean_speech_ibm, clean_speech_vad
from dvae_tpu.ops.video import preprocess_utterance, upsample_frames

DEFAULT_STFT = StftConfig(center=False)  # builder parametrization
FS = 16000
VISUAL_FPS_IN = 30.0
VISUAL_FPS_OUT = 62.5  # = 1/(wlen_sec*hop_percent), create_video_train_files.py:57-58


def _empirical_std(sq_sum, mean, n):
    """Bessel-corrected std from accumulated sums: all three reference
    builders use sqrt((sq_sum - n*mean^2)/(n-1)) with an explicit 'NB:
    compute the empirical std (!= regular std)' comment
    (create_train_set.py:204-207, create_audio_train_set.py:366-367,
    create_video_train_files.py:356-358)."""
    return np.sqrt(np.maximum(sq_sum - n * mean**2, 0.0) / (n - 1))


def _read_mat_frames(path) -> np.ndarray:
    """NTCD .mat files are HDF5 (matlab v7.3); single dataset of DCT frames."""
    with h5py.File(path, "r") as f:
        key = next(iter(f.keys()))
        return np.array(f[key])


def _labels_for(speech: np.ndarray, labels: str, cfg: StftConfig) -> np.ndarray:
    if labels == "vad_labels":
        vad = np.asarray(clean_speech_vad(jnp.asarray(speech), cfg))
        return vad[None, :]  # (1, frames)
    if labels == "ibm_labels":
        S = stft(jnp.asarray(speech), cfg)
        return np.asarray(clean_speech_ibm(S)).T  # (513, frames)
    raise ValueError(f"unknown labels {labels!r}")


def build_video_files(input_dir, output_dir, dataset_types=("train", "validation", "test"),
                      labels="vad_labels", width=67, height=67, workers=None):
    """.mat lip videos -> upsampled h5 + per-utterance label h5 + pixel stats."""
    input_dir, output_dir = str(input_dir), str(output_dir)
    stats_sum, stats_sq, stats_n = 0.0, 0.0, 0

    for dataset_type in dataset_types:
        mats = catalog.ntcd_timit.video_list(input_dir + "/", dataset_type)
        clean_in, _ = catalog.ntcd_timit.speech_list(input_dir + "/", dataset_type)

        def process(pair):
            mat_rel, clean_rel = pair
            mat_path = os.path.join(input_dir, mat_rel)
            frames = _read_mat_frames(mat_path)
            video = preprocess_utterance(frames, width, height)  # (n, H, W)

            speech, fs = read_wav(os.path.join(input_dir, clean_rel))
            peak = np.max(np.abs(speech))
            if peak > 0:
                speech = speech / peak
            label = _labels_for(speech, labels, DEFAULT_STFT)
            n_frames = label.shape[-1]
            video_up = upsample_frames(video, VISUAL_FPS_IN, VISUAL_FPS_OUT, n_out=n_frames)
            video_up = np.moveaxis(video_up, 0, -1)  # (H, W, frames)

            out_h5 = pathlib.Path(output_dir) / pathlib.Path(mat_rel).with_suffix("")
            out_h5 = out_h5.parent / (out_h5.name + "_upsampled.h5")
            out_h5.parent.mkdir(parents=True, exist_ok=True)
            with h5py.File(out_h5, "w") as f:
                f.create_dataset("X", data=video_up.astype(np.float32))

            lab_rel = pathlib.Path(mat_rel.replace("matlab_raw", "Clean")).with_suffix("")
            lab_path = pathlib.Path(output_dir) / lab_rel.parent / (
                lab_rel.name + f"_{labels}_upsampled.h5"
            )
            lab_path.parent.mkdir(parents=True, exist_ok=True)
            with h5py.File(lab_path, "w") as f:
                f.create_dataset("Y", data=label.astype(np.float32))
            return video_up if dataset_type == "train" else None

        with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
            for v in ex.map(process, zip(mats, clean_in)):
                if v is not None:
                    stats_sum += float(v.sum())
                    stats_sq += float((v.astype(np.float64) ** 2).sum())
                    stats_n += v.size

    if stats_n:
        mean = stats_sum / stats_n
        std = _empirical_std(stats_sq, mean, stats_n)
        stats_path = pathlib.Path(output_dir) / "ntcd_timit/matlab_raw/ntcd_timit_upsampled_statistics.h5"
        stats_path.parent.mkdir(parents=True, exist_ok=True)
        with h5py.File(stats_path, "w") as f:
            f.create_dataset("X_train_mean", data=np.float32([[mean]]))
            f.create_dataset("X_train_std", data=np.float32([[std]]))


def build_audio_train_set(input_dir, output_dir, dataset_types=("train", "validation", "test"),
                          labels="vad_labels", dataset_size="complete",
                          upsampled=True, workers=None, eps=1e-8):
    """Copy clean wavs + write per-utterance label h5s; copy noisy wavs and
    accumulate train noisy log-power statistics."""
    input_dir, output_dir = str(input_dir), str(output_dir)
    suffix = f"_{labels}_upsampled.h5" if upsampled else f"_{labels}.h5"

    for dataset_type in dataset_types:
        clean_in, clean_out = catalog.ntcd_timit.speech_list(input_dir + "/", dataset_type)

        def process_clean(pair):
            in_rel, out_rel = pair
            dst = pathlib.Path(output_dir) / out_rel
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copyfile(os.path.join(input_dir, in_rel), dst)
            speech, _ = read_wav(dst)
            peak = np.max(np.abs(speech))
            if peak > 0:
                speech = speech / peak
            label = _labels_for(speech, labels, DEFAULT_STFT)
            lab_path = dst.with_suffix("")
            lab_path = lab_path.parent / (lab_path.name + suffix)
            with h5py.File(lab_path, "w") as f:
                f.create_dataset("Y", data=label.astype(np.float32))

        with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(process_clean, zip(clean_in, clean_out)))

        # noisy copies + train statistics of the log power spectrogram.
        # The reference iterates (noisy -> clean) pairs so it can locate the
        # clean utterance's upsampled video and trim the spectrogram to the
        # video frame count before accumulating (create_audio_train_set.py:
        # 333-338, :259-271), copying each noisy wav via the
        # noisy_speech_dict output mapping (:215-221).
        out_map = catalog.ntcd_timit.noisy_speech_dict(input_dir + "/", dataset_type, dataset_size)
        nc_pairs = catalog.ntcd_timit.noisy_clean_pair_dict(input_dir + "/", dataset_type, dataset_size)
        n_tot, s_tot, sq_tot = 0, 0.0, 0.0

        def process_noisy(pair):
            noisy_rel, clean_rel = pair
            src = os.path.join(input_dir, noisy_rel)
            if not os.path.exists(src):
                return None
            if noisy_rel not in out_map:
                # the pair grid spans all SNRs ('-5'..'15') but the copy
                # grid stops at '10' (reference SNRS :336 vs noisy_speech
                # :246); a 15 dB corpus wav would KeyError in the
                # reference's own lookup (create_audio_train_set.py:341) —
                # skip it instead, matching the copy grid's intent
                return None
            dst = pathlib.Path(output_dir) / out_map[noisy_rel]
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copyfile(src, dst)
            if dataset_type != "train":
                return None
            x, fs = read_wav(dst)
            if fs != DEFAULT_STFT.fs:  # reference create_audio_train_set.py:233
                raise ValueError(f"Unexpected sampling rate {fs} in {src}")
            peak = np.max(np.abs(x))
            if peak > 0:
                x = x / peak
            # the reference's SETTINGS pass center=False + pad_at_end to
            # stft_pytorch here (create_audio_train_set.py:49-52,:245) —
            # exactly DEFAULT_STFT's parametrization
            # fused |STFT|^2 (no complex intermediate — complex arrays also
            # cannot be fetched over the axon tunnel, see ops/stft.py)
            p2 = np.asarray(power_spectrogram(jnp.asarray(x, jnp.float32), DEFAULT_STFT))
            logp = np.log(p2 + eps)
            # trim to the upsampled video frame count (reference :259-271)
            vid_rel = pathlib.Path(
                clean_rel.replace("Clean", "matlab_raw")
            ).with_suffix("")
            vid_path = pathlib.Path(output_dir) / vid_rel.parent / (
                vid_rel.name + "_upsampled.h5"
            )
            with h5py.File(vid_path, "r") as f:  # missing video = hard error,
                n_video = f["X"].shape[-1]       # as in the reference
            return (logp[: n_video].shape[0], logp[:n_video].sum(axis=0),
                    (logp[:n_video] ** 2).sum(axis=0))

        with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
            for r in ex.map(process_noisy, nc_pairs.items()):
                if r is not None:
                    n, s, sq = r
                    n_tot += n
                    s_tot = s_tot + s
                    sq_tot = sq_tot + sq

        if dataset_type == "train" and n_tot:
            mean = s_tot / n_tot
            std = _empirical_std(sq_tot, mean, n_tot)
            stats = pathlib.Path(output_dir) / "ntcd_timit/Noisy/ntcd_timit_log_power_spec_upsampled_statistics.h5"
            stats.parent.mkdir(parents=True, exist_ok=True)
            with h5py.File(stats, "w") as f:
                f.create_dataset("X_train_mean", data=mean[:, None].astype(np.float32))
                f.create_dataset("X_train_std", data=std[:, None].astype(np.float32))


def build_frame_dataset(input_dir, output_dir, labels="vad_labels",
                        dataset_types=("train", "validation"), eps=1e-8,
                        proc_video_dir=None, legacy_video_trim=False):
    """Consolidated frame-level training h5 (create_train_set.py:91-218).

    ``proc_video_dir``: where the builder reads ``<utt>_upsampled.h5`` videos
    to trim audio/labels to the video length (defaults to ``output_dir``).

    ``legacy_video_trim``: the reference trims to ``video.shape[0]``
    (create_train_set.py:181-186) — but the stored video is (67, 67, frames),
    so that is the image HEIGHT (= 67), silently truncating every utterance
    to its first 67 frames (~1.07 s). The shipped fixture
    (Clean_ibm_labels_upsampled.h5, 201 = 3x67 train frames) is a product of
    this bug. Default False trims to the actual video frame count; set True
    to reproduce the reference artifact bit-for-bit.
    """
    input_dir, output_dir = str(input_dir), str(output_dir)
    proc_video_dir = str(proc_video_dir) if proc_video_dir else output_dir
    y_dim = 1 if labels == "vad_labels" else 513
    out_path = pathlib.Path(output_dir) / f"ntcd_timit/Clean_{labels}_upsampled.h5"
    out_path.parent.mkdir(parents=True, exist_ok=True)

    with h5py.File(out_path, "w") as f:
        for split in dataset_types:
            fx = f.create_dataset(f"X_{split}", (513, 0), maxshape=(513, None),
                                  chunks=(513, 1), compression="lzf", dtype="float32")
            fy = f.create_dataset(f"Y_{split}", (y_dim, 0), maxshape=(y_dim, None),
                                  chunks=(y_dim, 1), compression="lzf", dtype="float32")
            clean_in, _ = catalog.ntcd_timit.speech_list(input_dir + "/", split)
            mats = catalog.ntcd_timit.video_list(input_dir + "/", split)
            n_sum, s_sum, sq_sum = 0, 0.0, 0.0
            for in_rel, mat_rel in zip(clean_in, mats):
                speech, _ = read_wav(os.path.join(input_dir, in_rel))
                peak = np.max(np.abs(speech))
                if peak > 0:
                    speech = speech / peak
                spec = np.asarray(power_spectrogram(
                    jnp.asarray(speech, jnp.float32), DEFAULT_STFT)).T
                # (513, frames), linear power — fused, no complex fetch
                label = _labels_for(speech, labels, DEFAULT_STFT)
                # trim to common length with the processed video stream
                video_path = pathlib.Path(proc_video_dir) / pathlib.Path(mat_rel).with_suffix("")
                video_path = video_path.parent / (video_path.name + "_upsampled.h5")
                n = min(spec.shape[1], label.shape[1])
                if video_path.exists():
                    with h5py.File(video_path, "r") as vf:
                        vshape = vf["X"].shape  # (67, 67, frames)
                    n_video = vshape[0] if legacy_video_trim else vshape[-1]
                    n = min(n, n_video)
                spec, label = spec[:, :n], label[:, :n]
                start = fx.shape[1]
                fx.resize(start + n, axis=1)
                fy.resize(start + n, axis=1)
                fx[:, start:] = spec
                fy[:, start:] = label
                if split == "train":
                    n_sum += n
                    s_sum = s_sum + spec.sum(axis=1)
                    sq_sum = sq_sum + (spec.astype(np.float64) ** 2).sum(axis=1)
            if split == "train" and n_sum:
                mean = s_sum / n_sum
                std = _empirical_std(sq_sum, mean, n_sum)
                f.create_dataset("X_train_mean", data=mean[:, None].astype(np.float32))
                f.create_dataset("X_train_std", data=std[:, None].astype(np.float32))
    return out_path


def build_qut_test_set(input_speech_dir, noise_dir, output_dir, dataset_type="test",
                       snrs=(-15.0, -10.0, -5.0, 0.0, 5.0), seed=0, workers=None):
    """QUT mixtures at random noise type / SNR per utterance
    (create_test_set.py:80-199): power-ratio noise gain, joint renorm,
    _s/_n/_x triplets + pickled SNR list."""
    input_speech_dir, output_dir = str(input_speech_dir), str(output_dir)
    clean_in, clean_out = catalog.ntcd_timit.speech_list(input_speech_dir + "/", dataset_type)

    noise_paths = catalog.qut.noise_list_preprocessed(str(noise_dir) + "/", dataset_type)
    noise_audios = {}
    for k, p in noise_paths.items():
        if os.path.exists(p):
            audio, fs_noise = read_wav(p)
            if fs_noise != FS:  # reference create_test_set.py:159-160
                raise ValueError(
                    f"Unexpected sampling rate {fs_noise} in {p} (want {FS}); "
                    "preprocess the noise first (qut.preprocess_noise)"
                )
            noise_audios[k] = audio
    if not noise_audios:
        raise FileNotFoundError(f"no preprocessed QUT noise under {noise_dir}")

    np.random.seed(seed)  # reference seeding (create_test_set.py:137)
    noise_types = ["cafe", "home", "street", "car"]
    noise_index = np.random.randint(len(noise_types), size=len(clean_in))
    snrs = list(snrs)
    snrs_index = np.random.randint(len(snrs), size=len(clean_in))
    all_snr_db = [snrs[i] for i in snrs_index]

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, dataset_type + "_snr_db.p"), "wb") as f:
        pickle.dump(all_snr_db, f, protocol=4)

    def process(i):
        in_rel, out_rel = clean_in[i], clean_out[i]
        speech, fs = read_wav(os.path.join(input_speech_dir, in_rel))
        if fs != FS:  # reference create_test_set.py:98-99
            raise ValueError(f"Unexpected sampling rate {fs} in {in_rel}")
        peak = np.max(np.abs(speech))
        if peak > 0:  # a digitally-silent wav must not become all-NaN
            speech = speech / peak
        ntype = noise_types[noise_index[i] % len(noise_types)]
        if ntype not in noise_audios:
            raise KeyError(
                f"drawn noise type {ntype!r} not in the preprocessed noise dir "
                f"(available: {sorted(noise_audios)}); a silent substitution "
                f"would skew the test set's noise-type distribution"
            )
        noise = catalog.qut.noise_segment(noise_audios, ntype, speech,
                                          rng=np.random.default_rng(seed + i))
        snr_db = all_snr_db[i]
        k = (np.sum(speech**2) * 10 ** (-snr_db / 10)) / np.sum(noise**2)
        noise = noise * np.sqrt(k)
        norm = np.max(np.abs(np.concatenate([speech, noise, speech + noise])))
        out_base = pathlib.Path(output_dir) / pathlib.Path(out_rel).with_suffix("")
        out_base.parent.mkdir(parents=True, exist_ok=True)
        write_wav(str(out_base) + "_s.wav", speech / norm, fs)
        write_wav(str(out_base) + "_n.wav", noise / norm, fs)
        write_wav(str(out_base) + "_x.wav", (speech + noise) / norm, fs)

    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(process, range(len(clean_in))))
    return all_snr_db


def copy_ntcd_noisy_test(input_dir, output_dir, dataset_type="test",
                         dataset_size="complete"):
    """Relayout pre-mixed Noisy_TCDTIMIT wavs into processed/Noisy/...
    (create_audio_set_ntcd_noise.py:111-133)."""
    input_dir, output_dir = str(input_dir), str(output_dir)
    pairs = catalog.ntcd_timit.noisy_speech_dict(input_dir + "/", dataset_type, dataset_size)
    copied = 0
    for in_rel, out_rel in pairs.items():
        src = os.path.join(input_dir, in_rel)
        if not os.path.exists(src):
            continue
        dst = pathlib.Path(output_dir) / out_rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(src, dst)
        copied += 1
    return copied
