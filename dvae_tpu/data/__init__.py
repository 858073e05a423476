from dvae_tpu.data.av_dataset import AudioVisualDataset
from dvae_tpu.data.datasets import FrameDataset, UtteranceDataset
from dvae_tpu.data.io import read_wav, write_wav

__all__ = ["AudioVisualDataset", "FrameDataset", "UtteranceDataset",
           "read_wav", "write_wav"]
