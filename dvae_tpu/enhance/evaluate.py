"""Batched enhancement sweeps over the NTCD-TIMIT noisy test set.

Replaces the reference's per-GPU process pools (evaluate_ntcd_M1.py:222-259)
with device-batched evaluation: utterances are grouped into batches, each
batch runs through the jitted Enhancer core, and outputs are written in the
reference's layout (``<model_dir>/<relative noisy path>_s_est.wav`` /
``_n_est.wav``), with the reference's idempotent resume-by-skip
(evaluate_ntcd_M1.py:84-89).
"""

from __future__ import annotations

import os
import pathlib

import h5py
import numpy as np

from dvae_tpu.data.catalog import ntcd_timit
from dvae_tpu.data.io import read_wav, write_wav


def load_oracle_labels(label_h5_path) -> np.ndarray:
    """(n_frames, y_dim) oracle labels from a builder h5."""
    with h5py.File(label_h5_path, "r") as f:
        y = f["Y"][:]
    return np.ascontiguousarray(y.T, dtype=np.float32)


def classifier_label_candidates(classifier_dir, speaker, utt,
                                rel_dir: str | None = None) -> list[str]:
    """Ordered direct-layout candidate paths for ``<utt>_y_hat_hard.{pt,npy}``
    — the ONE home of the path grammar (condition-mirrored layout first,
    then the reference's ``<spk>/`` layout; .pt preferred like everywhere
    else). Shared by :func:`find_classifier_labels` and run_metrics.py's
    in-sweep F1 probe so the two cannot drift."""
    import os

    candidates = []
    if rel_dir is not None:
        candidates += [os.path.join(classifier_dir, rel_dir,
                                    f"{utt}_y_hat_hard{ext}")
                       for ext in (".pt", ".npy")]
    candidates += [os.path.join(classifier_dir, speaker,
                                f"{utt}_y_hat_hard{ext}")
                   for ext in (".pt", ".npy")]
    return candidates


def find_classifier_labels(classifier_dir, speaker, utt,
                           y_dim: int | None = None,
                           rel_dir: str | None = None) -> np.ndarray:
    """Locate and load ``<utt>_y_hat_hard.{pt,npy}`` for a speaker.

    Tries the condition-mirrored layout ``<dir>/<rel_dir>/<utt>_...`` first
    when ``rel_dir`` (the noisy utterance's directory relative to the
    processed root) is given — predict_vad_labels.py's ``--source noisy``
    writes one prediction per noise/SNR condition into that mirror, and an
    utterance must be conditioned on the labels predicted from ITS OWN
    mixture, not a same-named file from another condition. Then the
    reference's direct layout ``<dir>/<spk>/<utt>_y_hat_hard.pt``
    (evaluate_ntcd_M2.py:85,180-189), then .npy, then a recursive search
    for either extension under any split subdirectory. ``y_dim`` resolves
    2-D orientation exactly (see load_classifier_labels)."""
    import glob
    import os

    for direct in classifier_label_candidates(classifier_dir, speaker, utt,
                                              rel_dir):
        if os.path.exists(direct):
            return load_classifier_labels(direct, y_dim)
    # sorted: glob's os.scandir order is filesystem-dependent — sharded
    # multi-machine sweeps must pick the SAME file for the same utterance.
    # .pt sorts before .npy, matching the direct-layout preference above.
    hits = sorted(glob.glob(os.path.join(classifier_dir, "**", speaker,
                                         utt + "_y_hat_hard.*"),
                            recursive=True),
                  key=lambda p: (not p.endswith(".pt"), p))
    if hits:
        return load_classifier_labels(hits[0], y_dim)
    raise FileNotFoundError(
        f"no {utt}_y_hat_hard.pt/.npy for speaker {speaker} under "
        f"{classifier_dir}"
    )


def load_classifier_labels(pt_or_npy_path, y_dim: int | None = None) -> np.ndarray:
    """Pre-computed video-classifier outputs: torch ``_y_hat_hard.pt`` tensors
    (evaluate_ntcd_M2.py:180-189) or .npy arrays, returned as
    ``(n_frames, y_dim)``.

    Orientation: pass ``y_dim`` (1 for VAD, 513 for IBM masks) to resolve it
    exactly — without the hint, a 2-D array is assumed frames-last when its
    first dim is smaller (correct for VAD's ``(1, frames)``, but an
    IBM-style ``(frames, 513)`` file with fewer than 513 frames would be
    transposed wrongly)."""
    p = str(pt_or_npy_path)
    if p.endswith(".pt"):
        import torch

        y = torch.load(p, map_location="cpu")
        y = y.numpy() if hasattr(y, "numpy") else np.asarray(y)
    else:
        y = np.load(p)
    y = np.asarray(y, dtype=np.float32)
    if y_dim is not None and y_dim > 1:
        # the explicit hint wins over every shape heuristic — a single-frame
        # IBM file ((513,) flat or (1, 513)) must come back (1, y_dim), not
        # be folded into a VAD column
        if y.ndim == 1:
            return y[None, :] if len(y) == y_dim else y[:, None]
        if y.shape[-1] == y_dim:
            return y
        if y.shape[0] == y_dim:
            return y.T
        raise ValueError(f"{pt_or_npy_path}: shape {y.shape} has no axis of "
                         f"size y_dim={y_dim}")
    if y.ndim == 1:
        return y[:, None]
    if 1 in y.shape:
        return y.reshape(-1, 1)
    if y.shape[0] < y.shape[1]:
        y = y.T
    return y


def clean_audio_rel(clean_rel: str, labels: str) -> str:
    """Label-h5 rel path -> clean audio rel path (the rewrite the reference
    applies at evaluate_ntcd_M1.py:108-113 / run_metrics.py:129-130)."""
    rel = clean_rel.replace("_" + labels, "").replace("_upsampled", "")
    return os.path.splitext(rel)[0] + ".wav"


def video_frame_counts(processed_dir, clean_rel_paths, labels: str):
    """Per-utterance video frame counts (the reference trims the spectrogram
    to the video length, evaluate_ntcd_M1.py:140-142); None when no video."""
    counts = []
    for rel in clean_rel_paths:
        h5_rel = rel.replace("Clean", "matlab_raw").replace("_" + labels, "")
        path = os.path.join(processed_dir, h5_rel)
        if os.path.exists(path):
            with h5py.File(path, "r") as f:
                counts.append(int(f["X"].shape[-1]))
        else:
            counts.append(None)
    return counts


def shard_slice(items, shard: tuple[int, int] | None):
    """The k-th of n contiguous ``np.array_split``-sized chunks (see
    ``evaluate_sweep``'s ``shard`` doc); identity when ``shard`` is None.
    Shared by the sweep and any per-utterance pre-pass (e.g. --save-labels)
    so every sharded stage of one invocation covers the same utterances."""
    if shard is None:
        return items
    k, n = shard
    if not 0 <= k < n:
        raise ValueError(f"shard index {k} out of range for {n} shards")
    q, r = divmod(len(items), n)
    start = k * q + min(k, r)
    return items[start : start + q + (1 if k < r else 0)]


def evaluate_sweep(
    enhancer,
    processed_dir,
    output_dir,
    dataset_type: str = "test",
    dataset_size: str = "complete",
    labels: str = "vad_labels",
    upsampled: bool = True,
    snr_filter: str | None = "10",
    batch_size: int = 16,
    y_loader=None,
    suffix: str = "",
    skip_existing: bool = True,
    key=None,
    log=print,
    shard: tuple[int, int] | None = None,
):
    """Run the full enhancement sweep.

    Args:
        enhancer: a bound ``dvae_tpu.enhance.pipeline.Enhancer``.
        y_loader: optional callable ``(noisy_rel, clean_rel) -> (n_frames, y_dim)``
            labels for conditional models.
        snr_filter: keep only this SNR (reference filters '10',
            evaluate_ntcd_M1.py:246); None = all.
        suffix: inserted in output names (e.g. '_y_hat_hard' ->
            ``*_s_est_y_hat_hard.wav``, evaluate_ntcd_M2.py:243-244).
        shard: optional ``(k, n)`` — process k of n takes the k-th contiguous
            chunk of the (SNR-filtered, pre-skip) utterance list, with
            ``np.array_split`` sizing — the coordination-free analog of the
            reference's utterance fan-out across its process pool
            (``np.array_split(file_paths, nb_devices*2)``,
            evaluate_ntcd_M1.py:249): disjoint machines write disjoint
            outputs into a shared tree, and resume-by-skip remains the only
            synchronization. Applied before the skip-existing filter so
            shard membership is stable across restarts.

    When the enhancer's ``cfg.ablation`` is a clean-z mode, the clean
    waveforms are read alongside the mixtures and the output names carry the
    reference's golden prefix (``<utt>_clean_z_nomcem_s_est<suffix>.wav`` —
    evaluate_ntcd_M1.py:184-188 commented write lines; shipped goldens under
    data/subset/models/).

    Returns the number of utterances enhanced.
    """
    import jax

    key = key if key is not None else jax.random.PRNGKey(0)
    ablation = getattr(enhancer.cfg, "ablation", "none")
    prefix = "" if ablation == "none" else "_" + ablation
    pairs = ntcd_timit.proc_noisy_clean_pair_dict(
        str(processed_dir) + "/", dataset_type, dataset_size, labels, upsampled
    )
    items = list(pairs.items())
    if snr_filter is not None:
        items = [it for it in items if it[0].split("/")[-4] == str(snr_filter)]
    items = shard_slice(items, shard)

    todo = []
    for noisy_rel, clean_rel in items:
        out_base = pathlib.Path(output_dir) / pathlib.Path(noisy_rel).with_suffix("")
        s_path = out_base.parent / (out_base.name + f"{prefix}_s_est{suffix}.wav")
        if skip_existing and s_path.exists():
            continue
        todo.append((noisy_rel, clean_rel, out_base))

    # Length-bucketed batching: each device batch pads every utterance to
    # the batch max (pipeline.Enhancer._prepare), so catalog order — which
    # interleaves 1–6 s utterances — wastes device time on padding. Sorting
    # the pending list by mixture file size (∝ samples for PCM wavs; no
    # decode needed) groups near-equal lengths per batch — measured 12.4%
    # faster on-chip at the corpus's 1.66x length spread (2x32 utterances,
    # niter=100, 2026-08-19). Outputs are per-utterance files, so processing
    # order is free; the path tiebreak keeps batch composition deterministic
    # across filesystems. Applied after shard_slice/skip so shard membership
    # and resume stay stable.
    todo.sort(key=lambda t: (
        os.path.getsize(os.path.join(processed_dir, t[0])), t[0]))

    chunks = [todo[s : s + batch_size] for s in range(0, len(todo), batch_size)]

    def clean_wav_path(clean_rel):
        return os.path.join(processed_dir, clean_audio_rel(clean_rel, labels))

    def batches():
        # generator: wav reading + label loading for batch k+1 happens while
        # the device still runs batch k (enhance_stream pipelines the rest)
        for chunk in chunks:
            wavs, ys, cleans = [], [], []
            for noisy_rel, clean_rel, _ in chunk:
                x, fs = read_wav(os.path.join(processed_dir, noisy_rel))
                wavs.append(x.astype(np.float32))
                if y_loader is not None:
                    ys.append(y_loader(noisy_rel, clean_rel))
                if ablation != "none":
                    s, _ = read_wav(clean_wav_path(clean_rel))
                    cleans.append(s.astype(np.float32))
            counts = video_frame_counts(
                processed_dir, [c for _, c, _ in chunk], labels
            )
            mf = [c if c is not None else 10**9 for c in counts]
            yield (wavs, (ys if y_loader else None), mf,
                   cleans if ablation != "none" else None)

    n_done = 0
    for chunk, out in zip(chunks, enhancer.enhance_stream(batches(), key=key)):
        for (noisy_rel, clean_rel, out_base), (s_hat, n_hat) in zip(chunk, out):
            out_base.parent.mkdir(parents=True, exist_ok=True)
            fs_out = enhancer.cfg.stft.fs  # not hardcoded: the Enhancer's
            # analysis rate is a public knob and the wav header must agree
            # n_est first: resume-by-skip keys on _s_est existing, so the
            # skip marker must be the LAST file written — a kill between the
            # two writes then re-does the utterance instead of leaving a
            # permanently n_est-less pair behind
            write_wav(out_base.parent / (out_base.name + f"{prefix}_n_est{suffix}.wav"), n_hat, fs_out)
            write_wav(out_base.parent / (out_base.name + f"{prefix}_s_est{suffix}.wav"), s_hat, fs_out)
            n_done += 1
        log(f"enhanced {n_done}/{len(todo)}")
    return n_done
