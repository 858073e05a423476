"""Training datasets over the builders' HDF5 layouts.

Mirrors the data contracts of /root/reference/packages/data_handling.py:

* :class:`FrameDataset` — frame-level random access into the big train h5
  (``X_<split>`` (513, N), ``Y_<split>``; data_handling.py:19-66). Unlike the
  reference's 16-worker chunk-cached random reads, we slurp the split into
  host RAM when it fits (the full NTCD train set is ~3 GB fp32) and feed the
  device with large contiguous shuffled batches — the TPU-idiomatic input
  path for a dataset this size.
* :class:`UtteranceDataset` — whole-utterance waveforms + per-utterance label
  h5s for sequence models / enhancement sweeps
  (data_handling.py:69-161 semantics: peak-normalized audio, on-the-fly
  spectrogram is done on device by the caller).
"""

from __future__ import annotations

import pathlib

import h5py
import numpy as np

from dvae_tpu.data.io import read_wav


def index_batches(n: int, batch_size: int,
                  rng: np.random.Generator | None = None,
                  drop_last: bool = False):
    """Yield index batches: arange -> rng.shuffle -> contiguous slices.

    THE batch-composition contract shared by the host-fed path
    (:meth:`FrameDataset.batches`) and the device-resident path
    (``train/loop._IndexDataset``) — one implementation, so the
    device-data loop's same-shuffle/same-key-stream invariant is
    structural, not a convention kept in two places."""
    idx = np.arange(n)
    if rng is not None:
        rng.shuffle(idx)
    stop = n - (n % batch_size) if drop_last else n
    for s in range(0, stop, batch_size):
        yield idx[s : s + batch_size]


class FrameDataset:
    """Frame-level (x, y) pairs from the builder's consolidated HDF5."""

    def __init__(self, h5_path, split: str = "train", in_memory: bool = True):
        self.h5_path = str(h5_path)
        self.split = split
        f = h5py.File(self.h5_path, "r")
        self._x = f[f"X_{split}"]  # (F, N) layout on disk
        self._y = f[f"Y_{split}"]
        self._file = f
        self.n = self._x.shape[-1]
        self.x_dim = self._x.shape[0]
        self.y_dim = self._y.shape[0]
        if in_memory:
            # chunked transposed read: peak RAM = steady state + one chunk,
            # not 2x (a plain `[:]` then `.T` copy doubles a multi-GB
            # complete-corpus split transiently)
            self._x = self._read_transposed(self._x)
            self._y = self._read_transposed(self._y)
            f.close()
            self._file = None
        self.in_memory = in_memory

    @staticmethod
    def _read_transposed(dset) -> np.ndarray:
        """(F, N) h5 dataset -> contiguous (N, F) array, read in ~64 MB
        column blocks."""
        f_dim, n = dset.shape
        out = np.empty((n, f_dim), dtype=dset.dtype)
        step = max(1, (1 << 26) // max(1, f_dim * dset.dtype.itemsize))
        for s in range(0, n, step):
            out[s : s + step] = dset[:, s : s + step].T
        return out

    def close(self):
        """Release the h5 handle (out-of-core mode; no-op after in-memory
        load). The object is unusable afterwards."""
        if self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @property
    def arrays(self):
        """The full in-memory (x (N, F), y (N, Yd)) arrays — the upload
        source for the device-resident training path (LoopConfig.
        device_data); raises in out-of-core mode."""
        if not self.in_memory:
            raise ValueError("arrays needs in_memory=True (device-resident "
                             "training uploads the whole split once)")
        return self._x, self._y

    @property
    def mean_std(self):
        """Stored train statistics (create_train_set.py:214-218), (F, 1)."""
        with h5py.File(self.h5_path, "r") as f:
            return f["X_train_mean"][:], f["X_train_std"][:]

    def __len__(self):
        return self.n

    def batches(self, batch_size: int, rng: np.random.Generator | None = None,
                drop_last: bool = False):
        """Yield (x (B,F), y (B,Yd)) numpy batches; shuffles when rng given."""
        for sel in index_batches(self.n, batch_size, rng, drop_last):
            if self.in_memory:
                yield self._x[sel], self._y[sel]
            else:
                sel_sorted = np.sort(sel)
                yield self._x[:, sel_sorted].T, self._y[:, sel_sorted].T


class UtteranceDataset:
    """Whole utterances: (waveform, per-frame labels) pairs.

    ``pairs`` is a list of (wav_path, label_h5_path | None); audio is
    peak-normalized like the reference loader (data_handling.py:123).
    """

    def __init__(self, pairs, fs: int = 16000, peak_normalize: bool = True):
        self.pairs = [(pathlib.Path(w), pathlib.Path(l) if l else None) for w, l in pairs]
        self.fs = fs
        self.peak_normalize = peak_normalize

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i):
        wav_path, label_path = self.pairs[i]
        x, fs = read_wav(wav_path)
        if fs != self.fs:
            raise ValueError(f"{wav_path}: fs={fs}, expected {self.fs}")
        if self.peak_normalize:
            peak = np.max(np.abs(x))
            if peak > 0:
                x = x / peak
        y = None
        if label_path is not None:
            with h5py.File(label_path, "r") as f:
                y = f["Y"][:]  # (y_dim, n_frames) on disk
            y = np.ascontiguousarray(y.T)  # (n_frames, y_dim)
        return x.astype(np.float32), y
