"""Reference-signature datasets (compat shim over dvae_tpu.data).

``HDF5CleanSpectrogramLabeledFrames`` is a working drop-in (same
constructor, same file-path rule, same lazy-open/``__getitem__`` contract —
reference data_handling.py:19-66); it returns torch CPU tensors like the
reference so downstream user code keeps working.

The four wav-based sequence datasets (data_handling.py:69-420) computed
spectrograms on the CPU inside ``__getitem__`` to feed torch loaders —
the opposite of dvae-tpu's input path, where waveforms stream to the
device and the STFT runs there (``dvae_tpu.ops.stft``, MXU matmul-DFT).
Instantiating them raises with the native equivalent
(``dvae_tpu.data.datasets.UtteranceDataset`` /
``dvae_tpu.data.av_dataset.AudioVisualDataset`` + the catalog pair
builders); see MIGRATING.md.
"""

from __future__ import annotations

import os

import h5py as h5
import numpy as np


class HDF5CleanSpectrogramLabeledFrames:
    """Frame-level (x, y) random access into the builders' consolidated h5
    (``X_<type>`` (513, N) / ``Y_<type>``). Native fast path:
    ``dvae_tpu.data.datasets.FrameDataset`` (in-memory, batched)."""

    def __init__(self, input_video_dir, dataset_name, dataset_type,
                 dataset_size, labels="vad_labels", upsampled=False,
                 rdcc_nbytes=1024 ** 2 * 40, rdcc_nslots=1e4):
        self.dataset_type = dataset_type
        self.rdcc_nbytes = rdcc_nbytes
        self.rdcc_nslots = rdcc_nslots
        suffix = "_upsampled" if upsampled else ""
        self.input_data_file = os.path.join(
            input_video_dir, dataset_name, f"Clean_{labels}{suffix}.h5")
        with h5.File(self.input_data_file, "r") as f:
            self.dataset_len = f["X_" + dataset_type].shape[-1]

    def open_hdf5(self):
        # deferred like the reference (:45-51) so multiprocessing workers
        # each hold their own handle
        self.f = h5.File(self.input_data_file, "r",
                         rdcc_nbytes=self.rdcc_nbytes,
                         rdcc_nslots=int(self.rdcc_nslots))
        self.data = self.f["X_" + self.dataset_type]
        self.labels = self.f["Y_" + self.dataset_type]

    def __getitem__(self, i):
        if not hasattr(self, "f"):
            self.open_hdf5()
        import torch

        return (torch.Tensor(np.array(self.data[..., i])),
                torch.Tensor(np.array(self.labels[..., i])))

    def __len__(self):
        return self.dataset_len

    def __del__(self):
        if hasattr(self, "f"):
            self.f.close()


def _wav_dataset_stub(name, ref_lines, native):
    class _Stub:
        def __init__(self, *a, **k):
            raise NotImplementedError(
                f"packages.data_handling.{name} (reference "
                f"data_handling.py:{ref_lines}) computed STFTs on the CPU "
                f"inside __getitem__; dvae-tpu streams waveforms and runs "
                f"the STFT on-device. Use {native} — see MIGRATING.md.")

    _Stub.__name__ = _Stub.__qualname__ = name
    return _Stub


NoisyWavWholeSequenceSpectrogramLabeledFrames = _wav_dataset_stub(
    "NoisyWavWholeSequenceSpectrogramLabeledFrames", "69-161",
    "dvae_tpu.data.datasets.UtteranceDataset + dvae_tpu.ops.stft")
NoisyWavWholeSequenceWavLabeledFrames = _wav_dataset_stub(
    "NoisyWavWholeSequenceWavLabeledFrames", "164-222",
    "dvae_tpu.data.datasets.UtteranceDataset")
AudioVisualSequenceLabeledFrames = _wav_dataset_stub(
    "AudioVisualSequenceLabeledFrames", "225-332",
    "dvae_tpu.data.av_dataset.AudioVisualDataset + dvae_tpu.ops.stft")
AudioVisualSequenceWavLabeledFrames = _wav_dataset_stub(
    "AudioVisualSequenceWavLabeledFrames", "335-420",
    "dvae_tpu.data.av_dataset.AudioVisualDataset")
