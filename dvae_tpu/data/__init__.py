from dvae_tpu.data.io import read_wav, write_wav

__all__ = ["read_wav", "write_wav"]
from dvae_tpu.data.av_dataset import AudioVisualDataset
from dvae_tpu.data.datasets import FrameDataset, UtteranceDataset
